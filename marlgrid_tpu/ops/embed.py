"""Pallas fused one-hot-embed GEMM — the encode-obs torso's first layer.

The mlp torso's first layer is ``flatten(one_hot(obs_codes)) @ W`` (see
models/actor_critic.py::OneHotEmbed — the TPU-native replacement for an
``nn.Embed`` gather, which serializes). Expressed in XLA that materializes
the one-hot operand in HBM: (S, cells, 42) bf16 is ~14x the size of the
uint8 codes it encodes — profiled at ~36 ms/iter of the round-3 PPO step
(B=4096, T=64), almost all of it one-hot HBM traffic, not MXU time.

This kernel builds the one-hots ON-CHIP: per (row, sample-block) grid step
it reads the raw uint8 codes (F, bs), constructs transposed one-hot tiles
(126, bs) for three view cells at a time in VMEM (42 slots per cell:
type 12 | color 10 | state 20 — one compare per plane against a
broadcasted iota), and contracts each against the VMEM-resident packed
weight tile (126, H) on the MXU. HBM traffic becomes codes-in +
activations-out only.

The backward pass needs no cotangent for the integer codes; grad_W is the
same one-hot build contracted against the output cotangent, accumulated
across sample blocks in the kernel's output ref (sequential TPU grid).

Weights arrive PACKED: ``pack_weights`` concatenates the model's three
per-plane tables into (n_groups, 126, H) — done in plain JAX inside the
train step, so autodiff routes grad_W back to the unpacked tables
automatically (the custom_vjp wraps only the (codes, packed) -> out core).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as C

N_STATE_CODES = 20                      # mirror models.actor_critic
WIDTHS = (C.N_TYPES + 1, C.N_COLORS + 1, N_STATE_CODES)
CW = sum(WIDTHS)                        # 42 one-hot slots per view cell
GROUP = 128 // CW                       # cells per MXU pass (3 -> K=126)
_OFF = (0, WIDTHS[0], WIDTHS[0] + WIDTHS[1])


def n_groups(cells: int) -> int:
    return -(-cells // GROUP)


def pack_weights(w0, w1, w2):
    """(cells, n_p, H) x3 -> (n_groups, GROUP*CW, H) padded group tiles.

    Plain JAX (cheap concat+pad of ~1 MB) so autodiff splits grad_W back to
    the three tables without any custom rule.
    """
    cells, h = w0.shape[0], w0.shape[-1]
    w = jnp.concatenate([w0, w1, w2], axis=1)       # (cells, CW, H)
    g = n_groups(cells)
    pad = g * GROUP - cells
    if pad:
        w = jnp.concatenate([w, jnp.zeros((pad, CW, h), w.dtype)])
    return w.reshape(g, GROUP * CW, h)


def _kernel(cells: int, bwd: bool):
    """Forward: out[r, s, :] = sum_cells W[cell, onehot(codes)].
    Backward (bwd=True): accumulate dW[g] += onehot^T-block @ dout."""
    g_total = n_groups(cells)
    dn = (((0,), (0,)), ((), ()))

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[0].astype(jnp.int32)              # (F, bs) codes
        bs = x.shape[-1]
        iotas = [jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
                 for n in WIDTHS]
        if bwd:
            @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
            def _init():
                o_ref[...] = jnp.zeros_like(o_ref)
        acc = None
        for g in range(g_total):
            # one (n_p, bs) compare per plane, sublane-concatenated into
            # the (126, bs) group tile: compare work == one-hot elements
            # (a full-width compare per plane costs 3.5x redundant VPU ops
            # — measured slower than the XLA formulation)
            pieces = []
            for q in range(GROUP):
                j = g * GROUP + q
                if j >= cells:
                    pieces.append(jnp.zeros((CW, bs), jnp.bfloat16))
                    continue
                for p, n in enumerate(WIDTHS):
                    code = x[p * cells + j][None, :]          # (1, bs)
                    if p == 2:
                        # box-packed states reach 176: clip into the state
                        # vocab (matches the XLA path's jnp.clip)
                        code = jnp.minimum(code, N_STATE_CODES - 1)
                    # out-of-vocab codes match nothing (one-hot semantics)
                    pieces.append((code == iotas[p])
                                  .astype(jnp.bfloat16))      # (n, bs)
            ohb = jnp.concatenate(pieces, axis=0)
            if bwd:
                # dW[g] += onehot @ dout : (126, bs) x (bs, H)
                dnb = (((1,), (0,)), ((), ()))
                o_ref[g] += jax.lax.dot_general(
                    ohb, w_ref[0].astype(jnp.bfloat16), dnb,
                    preferred_element_type=jnp.float32)
            else:
                y = jax.lax.dot_general(ohb, w_ref[g], dn,
                                        preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y           # (bs, H)
        if not bwd:
            o_ref[0] = acc

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("cells", "bs", "interpret"))
def _fwd(x, w, cells: int, bs: int, interpret: bool = False):
    """x (R, F, S) uint8, w (g, 126, H) bf16 -> (R, S, H) f32."""
    R, F, S = x.shape
    g, k, H = w.shape
    return pl.pallas_call(
        _kernel(cells, bwd=False),
        grid=(R, S // bs),
        in_specs=[
            pl.BlockSpec((1, F, bs), lambda r, i: (r, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, k, H), lambda r, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bs, H), lambda r, i: (r, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, S, H), jnp.float32),
        interpret=interpret,
    )(x, w)


@functools.partial(jax.jit,
                   static_argnames=("cells", "bs", "interpret"))
def _bwd_w(x, dout, cells: int, bs: int, interpret: bool = False):
    """x (R, F, S), dout (R, S, H) -> dW (g, 126, H) f32 (accumulated)."""
    R, F, S = x.shape
    H = dout.shape[-1]
    g = n_groups(cells)
    return pl.pallas_call(
        _kernel(cells, bwd=True),
        grid=(R, S // bs),
        in_specs=[
            pl.BlockSpec((1, F, bs), lambda r, i: (r, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, H), lambda r, i: (r, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, GROUP * CW, H), lambda r, i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, GROUP * CW, H), jnp.float32),
        interpret=interpret,
    )(x, dout)


def _block_samples(S: int) -> int:
    for bs in (512, 256, 128):
        if S % bs == 0:
            return bs
    return 0


def available(cells: int, S: int, H: int) -> bool:
    import os

    if os.environ.get("MARLGRID_TPU_NO_EMBED_KERNEL"):
        return False
    if jax.default_backend() != "tpu":
        return False
    # VMEM budget: packed W + per-block operands; H rides the lane dim
    if H > 1024 or n_groups(cells) * GROUP * CW * H * 2 > 4 << 20:
        return False
    return _block_samples(S) > 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def onehot_embed(x, w_packed, cells: int, bs: int, interpret: bool = False):
    """Fused one-hot embed: codes (R, F, S) x packed weights -> (R, S, H).

    ``x`` feature-major uint8/int codes, F = 3*cells ordered (plane, cell);
    ``w_packed`` from ``pack_weights``. Differentiable in ``w_packed`` only
    (codes are integers — like an embedding table lookup).
    """
    return _fwd(x, w_packed.astype(jnp.bfloat16), cells, bs, interpret)


def _vjp_fwd(x, w_packed, cells, bs, interpret):
    return onehot_embed(x, w_packed, cells, bs, interpret), x


def _vjp_bwd(cells, bs, interpret, x, dout):
    import numpy as np

    dw = _bwd_w(x, dout.astype(jnp.bfloat16), cells, bs, interpret)
    # integer codes take a float0 cotangent (they are indices, like an
    # embedding lookup's)
    return np.zeros(x.shape, jax.dtypes.float0), dw


onehot_embed.defvjp(_vjp_fwd, _vjp_bwd)
