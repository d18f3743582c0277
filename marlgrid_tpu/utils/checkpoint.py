"""Checkpoint / exact resume (SURVEY §5 checkpoint row).

The reference has no serialization at all (env state lives in Python
objects); here the whole system state — vmapped ``EnvState`` shards, RNG
keys, learner params/optimizer — is a pytree of arrays, so exact resume is
orbax save/restore of that pytree, bit-for-bit testable
(tests/test_checkpoint.py).
"""
from __future__ import annotations

import os
from typing import Any

import jax


def save(path: str, tree: Any, step: int = 0):
    """Save a pytree checkpoint; returns the checkpoint dir used."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(tree))
        mgr.wait_until_finished()
    return path


def restore(path: str, like: Any, step: int = None):
    """Restore a pytree checkpoint saved by :func:`save`.

    ``like`` is a pytree of arrays or ShapeDtypeStructs giving the target
    structure/sharding.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        if step is None:
            step = mgr.latest_step()
        def sds(x):
            if not hasattr(x, "shape"):
                return x
            # carry the sharding through: under multi-process
            # (jax.distributed) each process must restore ITS shards of
            # the global arrays, not a host-local copy
            sh = getattr(x, "sharding", None)
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh)

        like_sds = jax.tree.map(sds, like)
        return mgr.restore(step, args=ocp.args.StandardRestore(like_sds))
