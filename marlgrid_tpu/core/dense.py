"""Dense (gather-free) addressing primitives — the TPU-native core trick.

On TPU, a vmapped dynamic-index gather/scatter (``grid[x, y]`` with traced
per-env indices) lowers to a serialized per-element loop: profiling the v5e
showed ~19.5 ms per such op at batch 4096 — it WAS the entire step cost.
Boards are tiny (≤ 32x32) and tables tinier (≤ 11 entries), so every dynamic
access is re-expressed as one-hot compare + multiply + reduce: pure
elementwise/reduction work the VPU eats at full lane width, and matmul-shaped
contractions the MXU eats. No gather/scatter appears anywhere in the hot
path.

All helpers are written for UNBATCHED operands and vmap cleanly (that is the
point: under vmap they stay elementwise/contraction ops instead of becoming
batched gathers).
"""
from __future__ import annotations

import jax.numpy as jnp


def onehot(i, n: int, dtype=jnp.int32):
    """(n,) one-hot of a traced scalar index (clipped semantics: out-of-range
    i yields all-zeros, which composes with masking)."""
    return (jnp.arange(n) == i).astype(dtype)


def table_lookup(table, idx):
    """table[idx] without a gather: (T,) const table, any-shape idx.

    Returns table.dtype values; bool tables go through int32 accumulation.
    """
    t = jnp.asarray(table)
    acc = (
        (idx[..., None] == jnp.arange(t.shape[0])) * t.astype(jnp.int32)
    ).sum(-1)
    return acc.astype(t.dtype)


def read_cell(layer, x, y):
    """layer[x, y] for one (W, H) layer and traced scalars x, y."""
    W, H = layer.shape
    ox = onehot(x, W)
    oy = onehot(y, H)
    return ((layer * ox[:, None]).sum(0) * oy).sum(0)


def write_cell(layer, x, y, val):
    """layer with [x, y] set to val (no scatter)."""
    W, H = layer.shape
    mask = (jnp.arange(W)[:, None] == x) & (jnp.arange(H)[None, :] == y)
    return jnp.where(mask, val, layer)


def read_row(arr, i):
    """arr[i] for a small leading axis and traced scalar i; works for (N,)
    scalars and (N, k) rows alike (bool rows stay bool)."""
    sel = (jnp.arange(arr.shape[0]) == i).reshape(
        (-1,) + (1,) * (arr.ndim - 1))
    if arr.dtype == jnp.bool_:
        return (arr & sel).any(0)
    return (arr * sel.astype(arr.dtype)).sum(0)


def write_row(arr, i, val):
    """arr with row [i] set to val (broadcastable)."""
    sel = (jnp.arange(arr.shape[0]) == i).reshape(
        (-1,) + (1,) * (arr.ndim - 1))
    return jnp.where(sel, val, arr)


def add_at(vec, i, val):
    """vec with val added at [i]."""
    return vec + val * onehot(i, vec.shape[0], vec.dtype)


def flat_lookup_many(flat, idx):
    """flat[idx[t]] for a (M,) array and a (T,) index vector, densely.

    Bool masks use the packed-bitmask trick: the (M,) mask is packed into
    ceil(M/32) uint32 words, and each lookup becomes a one-hot select over
    the ~8 words plus a shift — (T, M/32) work instead of the naive (T, M)
    outer product (which dominated the whole step at 100 candidates x 225
    cells). Int arrays fall back to the (T, M) one-hot sum.
    """
    M = flat.shape[0]
    if flat.dtype == jnp.bool_:
        nw = -(-M // 32)
        bits = jnp.zeros((nw * 32,), jnp.uint32).at[:M].set(
            flat.astype(jnp.uint32))
        words = (bits.reshape(nw, 32)
                 << jnp.arange(32, dtype=jnp.uint32)).sum(-1, jnp.uint32)
        wsel = (idx // 32)[:, None] == jnp.arange(nw)[None, :]
        w = (wsel * words[None, :]).sum(-1, jnp.uint32)      # (T,)
        return ((w >> (idx % 32).astype(jnp.uint32)) & 1).astype(bool)
    oh = idx[:, None] == jnp.arange(M)[None, :]
    return (oh * flat[None, :].astype(jnp.int32)).sum(-1).astype(flat.dtype)


def select_window(layer, ox, oy):
    """Egocentric window read as two contractions (MXU-shaped):

    ``out[i, j] = sum_{x,y} ox[i, j, x] * layer[x, y] * oy[i, j, y]``

    ox: (vs, vs, W) one-hot (float/int), oy: (vs, vs, H). OOB view cells have
    all-zero one-hots and read 0 (caller overlays the OOB value).
    """
    tmp = jnp.einsum("ijw,wh->ijh", ox, layer,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("ijh,ijh->ij", tmp, oy.astype(tmp.dtype),
                      preferred_element_type=jnp.float32)
