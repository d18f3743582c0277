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
