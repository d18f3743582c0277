"""The RNG protocol (SPEC §4) — the ONLY source of randomness in the system.

The reference drew from gym's numpy MT19937 RNG (``marlgrid/base.py — §seed``,
SURVEY §3.1 [H]); with the reference mount empty, parity is defined against the
vendored oracle (SURVEY §7.3 item 1, option iii), and both the jitted engine
and the oracle derive every draw through the helpers here, so their streams
agree by construction.

TPU shape: all of a reset's (and a step's) draws come from a handful of BULK
threefry calls — per-event eager/fused key folding was ~60 serial kernels per
reset. Event ``e`` consumes row ``e`` of the bulk arrays (a static slice).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

fold_in = jax.random.fold_in


def reset_draws(key, n_events: int, max_tries: int, x0, rw, y0, rh,
                width, height):
    """All draws of one reset (SPEC §4).

    Returns ``(k_state, xs (E, T), ys (E, T), dirs (E,), split_x, door_y)``:
    placement event ``e`` uses candidate streams ``xs[e]/ys[e]`` and (if it
    places an agent) initial direction ``dirs[e]``; split_x/door_y are the
    doorkey scenario's wall draws (ignored elsewhere). The post-reset state
    carries ``k_state``.
    """
    k_events, k_state = jax.random.split(key)
    xs = jax.random.randint(fold_in(k_events, 0), (n_events, max_tries),
                            x0, x0 + rw, dtype=jnp.int32)
    ys = jax.random.randint(fold_in(k_events, 1), (n_events, max_tries),
                            y0, y0 + rh, dtype=jnp.int32)
    dirs = jax.random.randint(fold_in(k_events, 2), (n_events,), 0, 4,
                              dtype=jnp.int32)
    split_x = jax.random.randint(fold_in(k_events, 3), (), 2, width - 2,
                                 dtype=jnp.int32)
    door_y = jax.random.randint(fold_in(k_events, 4), (), 1, height - 1,
                                dtype=jnp.int32)
    return k_state, xs, ys, dirs, split_x, door_y


def step_draws(key, n_agents: int, max_tries: int, x0, rw, y0, rh,
               with_respawn: bool):
    """All draws of one step (SPEC §4).

    Returns ``(next_key, perm)`` or, with respawn,
    ``(next_key, perm, rxs (N, T), rys (N, T), rdirs (N,))`` where agent i's
    in-step respawn event uses row i.
    """
    k_next, sub = jax.random.split(key)
    perm = jax.random.permutation(sub, n_agents)
    if not with_respawn:
        return k_next, perm
    rxs = jax.random.randint(fold_in(sub, 0), (n_agents, max_tries),
                             x0, x0 + rw, dtype=jnp.int32)
    rys = jax.random.randint(fold_in(sub, 1), (n_agents, max_tries),
                             y0, y0 + rh, dtype=jnp.int32)
    rdirs = jax.random.randint(fold_in(sub, 2), (n_agents,), 0, 4,
                               dtype=jnp.int32)
    return k_next, perm, rxs, rys, rdirs


def autoreset_key(next_key):
    """Key feeding the fresh episode in ``step_autoreset`` (SPEC §9)."""
    return fold_in(next_key, 0xA110)
