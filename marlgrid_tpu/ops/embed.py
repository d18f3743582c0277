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


def group_size(widths=WIDTHS) -> int:
    """Cells per MXU pass: compact scenario palettes (models.OneHotEmbed
    ``palettes``) shrink the per-cell slot count, packing MORE cells into
    each 128-wide contraction — goal_cycle's 42 -> 17 slots turns 17
    K=126 passes into 7 K=119 ones (the embed's cost is pass-count)."""
    return max(1, 128 // sum(widths))


def n_groups(cells: int, widths=WIDTHS) -> int:
    return -(-cells // group_size(widths))


def pack_weights(w0, w1, w2):
    """(cells, n_p, H) x3 -> (n_groups, GROUP*CW, H) padded group tiles.

    Plain JAX (cheap concat+pad of ~1 MB) so autodiff splits grad_W back to
    the three tables without any custom rule. Widths are read off the
    table shapes, so compact-palette tables pack identically.
    """
    cells, h = w0.shape[0], w0.shape[-1]
    widths = (w0.shape[1], w1.shape[1], w2.shape[1])
    cw, grp = sum(widths), group_size(widths)
    w = jnp.concatenate([w0, w1, w2], axis=1)       # (cells, cw, H)
    g = n_groups(cells, widths)
    pad = g * grp - cells
    if pad:
        w = jnp.concatenate([w, jnp.zeros((pad, cw, h), w.dtype)])
    return w.reshape(g, grp * cw, h)


def _kernel(cells: int, bwd: bool, widths=WIDTHS, values=None, rb: int = 1):
    """Forward: out[r, s, :] = sum_cells W[cell, onehot(codes)].
    Backward (bwd=True): accumulate dW[g] += onehot^T-block @ dout.

    ``values`` (tuple of per-plane code tuples) switches the one-hot
    compare from iota to an explicit vocabulary — the compact-palette
    path; out-of-vocabulary codes match nothing (zero row), exactly the
    one-hot semantics of an unused slot.

    ``rb``: leading-dim rows processed PER GRID STEP. The round-5 probes
    (H-sweep trace: kernel time flat in H; palette sweep: flat in vocab
    width and pass count; two alternative one-hot builds measured neutral/
    slower) localized the kernel's residual cost to per-grid-step
    orchestration (~1 us/step x ~10k tiny steps per PPO iteration — the
    update path runs R=1024 blocks of only 256 samples each). Folding rb
    rows into one grid step divides the step count; the per-row work is
    unchanged."""
    g_total = n_groups(cells, widths)
    cw, grp = sum(widths), group_size(widths)
    dn = (((0,), (0,)), ((), ()))

    def kernel(x_ref, w_ref, o_ref):
        if values is None:
            vocab = [jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
                     for n in widths]

            def plane_onehot(code, p):
                return (code == vocab[p]).astype(jnp.bfloat16)
        else:
            # palette vocabularies: pallas kernels cannot capture array
            # constants, so compare per SCALAR value (compile-time loop;
            # compare count == one-hot elements, same as the iota path)
            def plane_onehot(code, p):
                return jnp.concatenate(
                    [(code == int(v)).astype(jnp.bfloat16)
                     for v in values[p]], axis=0)       # (n_p, bs)
        if bwd:
            @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
            def _init():
                o_ref[...] = jnp.zeros_like(o_ref)
        for r in range(rb):
            x = x_ref[r].astype(jnp.int32)          # (F, bs) codes
            bs = x.shape[-1]
            acc = None
            for g in range(g_total):
                # one (n_p, bs) compare per plane, sublane-concatenated
                # into the group tile: compare work == one-hot elements
                # (a full-width compare per plane costs 3.5x redundant VPU
                # ops — measured slower than the XLA formulation)
                pieces = []
                for q in range(grp):
                    j = g * grp + q
                    if j >= cells:
                        pieces.append(jnp.zeros((cw, bs), jnp.bfloat16))
                        continue
                    for p, n in enumerate(widths):
                        code = x[p * cells + j][None, :]      # (1, bs)
                        if p == 2 and values is None:
                            # box-packed states reach 176: clip into the
                            # state vocab (matches the XLA path's clip)
                            code = jnp.minimum(code, N_STATE_CODES - 1)
                        # out-of-vocab codes match nothing (one-hot)
                        pieces.append(plane_onehot(code, p))  # (n, bs)
                ohb = jnp.concatenate(pieces, axis=0)
                if bwd:
                    # dW[g] += onehot @ dout : (126, bs) x (bs, H)
                    dnb = (((1,), (0,)), ((), ()))
                    o_ref[g] += jax.lax.dot_general(
                        ohb, w_ref[r].astype(jnp.bfloat16), dnb,
                        preferred_element_type=jnp.float32)
                else:
                    y = jax.lax.dot_general(
                        ohb, w_ref[g], dn,
                        preferred_element_type=jnp.float32)
                    acc = y if acc is None else acc + y       # (bs, H)
            if not bwd:
                # bf16 OUTPUT, f32 accumulate: one rounding, in VMEM —
                # identical to the former f32-out + XLA convert (the
                # convert cost ~2.4 ms/iter of HBM roundtrip, traced r5),
                # and the consumer (OneHotEmbed) wants bf16 anyway
                o_ref[r] = acc.astype(jnp.bfloat16)

    return kernel


def _row_block(R: int) -> int:
    """Leading-dim rows per grid step (largest of 32/16/8/4/2 dividing R) —
    divides the grid-step count, the kernel's measured residual cost
    (round-5 probes: kernel time flat in H, vocab width, and pass count;
    ~1 us x ~10k tiny grid steps per PPO iteration before this)."""
    for rb in (32, 16, 8, 4, 2):
        if R % rb == 0:
            return rb
    return 1


@functools.partial(jax.jit,
                   static_argnames=("cells", "bs", "interpret", "widths",
                                    "values"))
def _fwd(x, w, cells: int, bs: int, interpret: bool = False,
         widths=WIDTHS, values=None):
    """x (R, F, S) uint8, w (g, grp*cw, H) bf16 -> (R, S, H) bf16
    (f32 accumulate in VMEM, one rounding at the output write)."""
    R, F, S = x.shape
    g, k, H = w.shape
    rb = _row_block(R)
    return pl.pallas_call(
        _kernel(cells, bwd=False, widths=widths, values=values, rb=rb),
        grid=(R // rb, S // bs),
        in_specs=[
            pl.BlockSpec((rb, F, bs), lambda r, i: (r, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, k, H), lambda r, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, bs, H), lambda r, i: (r, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, S, H), jnp.bfloat16),
        interpret=interpret,
    )(x, w)


@functools.partial(jax.jit,
                   static_argnames=("cells", "bs", "interpret", "widths",
                                    "values"))
def _bwd_w(x, dout, cells: int, bs: int, interpret: bool = False,
           widths=WIDTHS, values=None):
    """x (R, F, S), dout (R, S, H) -> dW (g, grp*cw, H) f32 (accumulated)."""
    R, F, S = x.shape
    H = dout.shape[-1]
    g = n_groups(cells, widths)
    k = group_size(widths) * sum(widths)
    rb = _row_block(R)
    return pl.pallas_call(
        _kernel(cells, bwd=True, widths=widths, values=values, rb=rb),
        grid=(R // rb, S // bs),
        in_specs=[
            pl.BlockSpec((rb, F, bs), lambda r, i: (r, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, bs, H), lambda r, i: (r, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, k, H), lambda r, i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, k, H), jnp.float32),
        interpret=interpret,
    )(x, dout)


def _block_samples(S: int) -> int:
    for bs in (1024, 512, 256, 128):
        if S % bs == 0:
            return bs
    return 0


def available(cells: int, S: int, H: int, widths=WIDTHS) -> bool:
    import os

    if os.environ.get("MARLGRID_TPU_NO_EMBED_KERNEL"):
        return False
    if jax.default_backend() != "tpu":
        return False
    # VMEM budget: packed W + per-block operands; H rides the lane dim
    k = group_size(widths) * sum(widths)
    if H > 1024 or n_groups(cells, widths) * k * H * 2 > 4 << 20:
        return False
    return _block_samples(S) > 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def onehot_embed(x, w_packed, cells: int, bs: int, interpret: bool = False,
                 widths=WIDTHS, values=None):
    """Fused one-hot embed: codes (R, F, S) x packed weights -> (R, S, H).

    ``x`` feature-major uint8/int codes, F = 3*cells ordered (plane, cell);
    ``w_packed`` from ``pack_weights``. Differentiable in ``w_packed`` only
    (codes are integers — like an embedding table lookup). ``widths`` /
    ``values``: the compact-palette vocabulary (models.OneHotEmbed
    ``palettes``); both must be hashable tuples (static).
    """
    return _fwd(x, w_packed.astype(jnp.bfloat16), cells, bs, interpret,
                widths, values)


def _vjp_fwd(x, w_packed, cells, bs, interpret, widths, values):
    return onehot_embed(x, w_packed, cells, bs, interpret, widths,
                        values), x


def _vjp_bwd(cells, bs, interpret, widths, values, x, dout):
    import numpy as np

    dw = _bwd_w(x, dout.astype(jnp.bfloat16), cells, bs, interpret,
                widths, values)
    # integer codes take a float0 cotangent (they are indices, like an
    # embedding lookup's)
    return np.zeros(x.shape, jax.dtypes.float0), dw


onehot_embed.defvjp(_vjp_fwd, _vjp_bwd)
