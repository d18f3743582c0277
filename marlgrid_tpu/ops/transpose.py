"""Batch-major <-> batch-minor transpose as a Pallas TPU kernel.

The obs pipeline extracts view cells with a B-major einsum pair (the only
fast formulation — TPU gathers serialize) but consumes them batch-minor
(batch on lanes). XLA fuses the layout swap into the producing reduction,
which emits strided writes measured ~10x slower than the einsum itself; a
standalone tiled transpose kernel keeps the reduction dense and moves the
swap at full HBM rate. Block size 256 measured fastest on v5e (larger
blocks trip Mosaic's pipelining for this K).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BB = 256


def _tkernel(x_ref, o_ref):
    o_ref[:] = x_ref[:].T


@functools.partial(jax.jit, static_argnames=("bb",))
def _pallas_t(x, bb: int):
    B, K = x.shape
    return pl.pallas_call(
        _tkernel,
        grid=(B // bb,),
        in_specs=[pl.BlockSpec((bb, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((K, bb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, B), x.dtype),
    )(x)


def transpose_bk(x: jax.Array) -> jax.Array:
    """(B, K) -> (K, B). Pallas on TPU when B tiles evenly; XLA otherwise."""
    B, K = x.shape
    if jax.default_backend() == "tpu" and B % _BB == 0:
        return _pallas_t(x, _BB)
    return x.T


def _tkernel4(x_ref, o_ref):
    o_ref[0, 0] = x_ref[0, 0].T


@functools.partial(jax.jit, static_argnames=("bb",))
def _pallas_t4(x, bb: int):
    T, N, F, B = x.shape
    return pl.pallas_call(
        _tkernel4,
        grid=(N, T, B // bb),
        in_specs=[pl.BlockSpec((1, 1, F, bb), lambda n, t, i: (t, n, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, bb, F), lambda n, t, i: (n, t, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, T, B, F), x.dtype),
    )(x)


def transpose_traj(x: jax.Array) -> jax.Array:
    """(T, N, F, B) -> (N, T, B, F): the ONE bulk lane->sublane swap of a
    batch-minor-stored trajectory (e.g. PPO observations) into sample-major
    rows, done once per iteration at copy rate instead of per scan step
    (XLA's per-step buffer relayout measured 23 ms/iter at B=4096)."""
    T, N, F, B = x.shape
    if jax.default_backend() == "tpu" and B % _BB == 0:
        return _pallas_t4(x, _BB)
    return x.transpose(1, 0, 3, 2)
