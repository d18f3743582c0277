"""Device mesh construction and sharding helpers (SURVEY §2.3).

The scaling axes of this framework are env count (data-parallel shards of the
vmapped env batch — embarrassingly parallel, no cross-env collectives) and
learner model size (tensor-parallel shards of the network). Collectives ride
the mesh: gradient reductions over the ``data`` axis, activation/weight
collectives over ``model`` — all inserted by GSPMD from sharding annotations
(jax-ml.github.io/scaling-book recipe: pick a mesh, annotate, let XLA insert
collectives). Multi-host: the same mesh spans hosts via
``jax.distributed.initialize`` + ``jax.devices()``; env shards stay host-local
along ``data`` so rollouts never cross DCN.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """2-D ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), \
        f"{n_data}x{n_model} mesh != {len(devices)} devices"
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-of-envs sharding: leading env axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Constrain a pytree of (B, ...) arrays onto the env sharding."""
    s = env_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(x, s), tree)


def host_local_slice(mesh: Mesh, global_batch: int) -> slice:
    """This host's slice of the global env batch (multi-host launches)."""
    idx = jax.process_index()
    n = jax.process_count()
    per = global_batch // n
    return slice(idx * per, (idx + 1) * per)
