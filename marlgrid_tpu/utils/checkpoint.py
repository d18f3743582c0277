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


def save(path: str, tree: Any, step: int = 0, config: dict = None):
    """Save a pytree checkpoint; returns the checkpoint dir used.

    ``config`` (JSON-serializable) makes the checkpoint SELF-DESCRIBING:
    it is written once as ``<path>/config.json`` so consumers
    (``parallel/evaluate.py``) can rebuild the restore template and env
    without the user re-typing the training flags (a shape-coincident
    mismatch would restore garbage silently). Only process 0 writes under
    multi-process.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if config is not None and jax.process_index() == 0:
        save_config(path, config)
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(tree))
        mgr.wait_until_finished()
    return path


def save_config(path: str, config: dict):
    """Write ``config.json`` beside the checkpoint steps (atomic rename)."""
    import json

    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, ".config.json.tmp")
    with open(tmp, "w") as f:
        json.dump(config, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, "config.json"))


def load_config(path: str) -> dict:
    """Read ``config.json`` written by :func:`save`; None if absent
    (pre-round-4 checkpoints are not self-describing)."""
    import json

    p = os.path.join(os.path.abspath(path), "config.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


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
