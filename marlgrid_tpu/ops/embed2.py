"""Plane-major fused one-hot-embed kernel — the round-5 rebuild candidate.

The original kernel (ops/embed.py) packs GROUP tiles of 128//cw cells and
builds each (grp*cw, bs) one-hot tile from 3*grp single-row slices of the
code block plus a 3*grp-piece sublane concat — per-CELL mechanics that are
invariant to vocabulary width, MXU pass count, and H. The round-4 palette
experiment (42 -> 14 slots, 17 -> 6 passes, +2-3% end to end) plus the
round-5 H/bs/mode probes (scripts/embed_roofline.py) point at exactly that
per-cell build as the kernel's residual bound.

This variant builds each PLANE's one-hot in ONE broadcast compare:

    code  = x[p*cells : (p+1)*cells]                  # (cells, bs) slice
    oh3   = (code[:, None, :] == vocab[1, n_p, 1])    # (cells, n_p, bs)
    y    += dot_general(oh3, W_p, contract {0,1}x{0,1})   # (bs, H)

Three contiguous slices, three broadcast compares, three multi-dim-
contraction dots per grid step — no per-cell slicing, no piece concat.
Weights stay in their NATURAL (cells, n_p, H) table shape (no packing;
autodiff routes grad_W straight to the tables). Out-of-vocabulary codes
one-hot to zero exactly like ops/embed.py; the full-vocab state plane
clips at N_STATE_CODES-1 to match the XLA path.

Selected by MARLGRID_TPU_EMBED_V2=1 (models.OneHotEmbed); bit-compatible
with the XLA formulation (tests/test_embed_kernel.py round-5 additions).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as C

N_STATE_CODES = 20
WIDTHS = (C.N_TYPES + 1, C.N_COLORS + 1, N_STATE_CODES)


def _plane_onehot(code, cells: int, n: int, values, plane: int):
    """(cells*n, bs) bf16 one-hot of a plane's (cells, bs) code block with
    ZERO per-cell operations.

    The naive builds (per-cell slice + piece concat in ops/embed.py; 3D
    broadcast-compare + merge-sublane reshape) both lower to ~cells
    misaligned sublane copies — the measured bound of the v1 kernel (time
    flat in H and in vocabulary width, r5 H-sweep trace). Here the
    replication code_rep[r, s] = code[r // n, s] is ONE MXU matmul against
    an iota-built 0/1 replication matrix (+38% MXU work — cheap, the
    kernel sits ~3x above its MXU bound), and the compare runs against an
    iota-built vocabulary column — every op a full-tile aligned VPU/MXU
    op. Equality compares are exact: codes are small ints (< 2^24) in f32.
    """
    K = cells * n
    rep = (jax.lax.broadcasted_iota(jnp.int32, (K, cells), 0) // n
           == jax.lax.broadcasted_iota(jnp.int32, (K, cells), 1)) \
        .astype(jnp.bfloat16)                        # Rep[r, c] = r//n == c
    code_rep = jax.lax.dot_general(
        rep, code.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (K, bs) f32 exact
    slot = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0) % n
    if values is None:
        voc = slot.astype(jnp.float32)
    else:
        voc = jnp.zeros((K, 1), jnp.float32)
        for i, v in enumerate(values[plane]):
            voc = voc + jnp.where(slot == i, jnp.float32(int(v)), 0.0)
    return (code_rep == voc).astype(jnp.bfloat16)


def _kernel_fwd(cells: int, widths, values):
    dn = (((0,), (0,)), ((), ()))

    def kernel(x_ref, w0_ref, w1_ref, w2_ref, o_ref):
        x = x_ref[0].astype(jnp.int32)               # (F, bs)
        acc = None
        for p, (n, w_ref) in enumerate(
                zip(widths, (w0_ref, w1_ref, w2_ref))):
            code = x[p * cells:(p + 1) * cells]      # (cells, bs) slice
            if p == 2 and values is None:
                code = jnp.minimum(code, N_STATE_CODES - 1)
            oh = _plane_onehot(code, cells, n, values, p)
            y = jax.lax.dot_general(oh, w_ref[...], dn,
                                    preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y      # (bs, H)
        o_ref[0] = acc

    return kernel


def _kernel_bwd(cells: int, widths, values):
    # dW_p (cells*n, H) += oh (cells*n, bs) @ dout (bs, H)
    dn = (((1,), (0,)), ((), ()))

    def kernel(x_ref, g_ref, o0_ref, o1_ref, o2_ref):
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _init():
            o0_ref[...] = jnp.zeros_like(o0_ref)
            o1_ref[...] = jnp.zeros_like(o1_ref)
            o2_ref[...] = jnp.zeros_like(o2_ref)

        x = x_ref[0].astype(jnp.int32)
        dout = g_ref[0].astype(jnp.bfloat16)         # (bs, H)
        for p, (n, o_ref) in enumerate(
                zip(widths, (o0_ref, o1_ref, o2_ref))):
            code = x[p * cells:(p + 1) * cells]
            if p == 2 and values is None:
                code = jnp.minimum(code, N_STATE_CODES - 1)
            oh = _plane_onehot(code, cells, n, values, p)
            o_ref[...] += jax.lax.dot_general(
                oh, dout, dn, preferred_element_type=jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("cells", "bs", "interpret",
                                             "widths", "values"))
def _fwd(x, w0, w1, w2, cells, bs, interpret=False, widths=WIDTHS,
         values=None):
    """x (R, F, S) uint8, w_p (cells, n_p, H) bf16 -> (R, S, H) f32.

    Weights are flattened to (cells*n_p, H) OUTSIDE the kernel (a free
    XLA reshape) so the kernel's dot sees a single contracting dim."""
    R, F, S = x.shape
    H = w0.shape[-1]
    w2d = [w.reshape(-1, H) for w in (w0, w1, w2)]

    def wspec(w):
        return pl.BlockSpec(w.shape, lambda r, i: (0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _kernel_fwd(cells, widths, values),
        grid=(R, S // bs),
        in_specs=[pl.BlockSpec((1, F, bs), lambda r, i: (r, 0, i),
                               memory_space=pltpu.VMEM)]
        + [wspec(w) for w in w2d],
        out_specs=pl.BlockSpec((1, bs, H), lambda r, i: (r, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, S, H), jnp.float32),
        interpret=interpret,
    )(x, *w2d)


@functools.partial(jax.jit, static_argnames=("cells", "bs", "interpret",
                                             "widths", "values"))
def _bwd(x, dout, cells, bs, interpret=False, widths=WIDTHS, values=None,
         H=None):
    R, F, S = x.shape
    H = dout.shape[-1]

    def ospec(n):
        return pl.BlockSpec((cells * n, H), lambda r, i: (0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _kernel_bwd(cells, widths, values),
        grid=(R, S // bs),
        in_specs=[pl.BlockSpec((1, F, bs), lambda r, i: (r, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, bs, H), lambda r, i: (r, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[ospec(n) for n in widths],
        out_shape=[jax.ShapeDtypeStruct((cells * n, H), jnp.float32)
                   for n in widths],
        interpret=interpret,
    )(x, dout)


def _block_samples(S: int) -> int:
    for bs in (512, 256, 128):
        if S % bs == 0:
            return bs
    return 0


def available(cells: int, S: int, H: int, widths=WIDTHS) -> bool:
    import os

    if not os.environ.get("MARLGRID_TPU_EMBED_V2"):
        return False
    if os.environ.get("MARLGRID_TPU_NO_EMBED_KERNEL"):
        return False
    if jax.default_backend() != "tpu":
        return False
    if H > 1024 or cells * sum(widths) * H * 2 > 4 << 20:
        return False
    return _block_samples(S) > 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def onehot_embed2(x, w0, w1, w2, cells: int, bs: int,
                  interpret: bool = False, widths=WIDTHS, values=None):
    """Plane-major fused one-hot embed: codes (R, F, S) x three natural
    (cells, n_p, H) tables -> (R, S, H). Differentiable in the tables."""
    return _fwd(x, w0.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
                w2.astype(jnp.bfloat16), cells, bs, interpret, widths,
                values)


def _vjp_fwd(x, w0, w1, w2, cells, bs, interpret, widths, values):
    return onehot_embed2(x, w0, w1, w2, cells, bs, interpret, widths,
                         values), x


def _vjp_bwd(cells, bs, interpret, widths, values, x, dout):
    import numpy as np

    dws = _bwd(x, dout.astype(jnp.bfloat16), cells, bs, interpret,
               widths, values)
    H = dout.shape[-1]
    return (np.zeros(x.shape, jax.dtypes.float0),) + tuple(
        dw.reshape(cells, n, H) for dw, n in zip(dws, widths))


onehot_embed2.defvjp(_vjp_fwd, _vjp_bwd)
