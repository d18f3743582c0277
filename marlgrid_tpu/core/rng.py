"""The RNG protocol (SPEC §4) — the ONLY source of randomness in the system.

The reference drew from gym's numpy MT19937 RNG (``marlgrid/base.py — §seed``,
SURVEY §3.1 [H]); with the reference mount empty, parity is defined against the
vendored oracle (SURVEY §7.3 item 1, option iii), and both the jitted engine and
the oracle derive every draw through the helpers here, so their streams agree by
construction. All helpers are pure functions of a threefry key and are safe to
call traced (engine) or eagerly (oracle).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

fold_in = jax.random.fold_in


def split_step_key(key):
    """Per-step key schedule: returns (next_state_key, step_subkey)."""
    k_next, sub = jax.random.split(key)
    return k_next, sub


def step_perm(sub, n_agents: int):
    """Randomized agent priority order for one step (SURVEY §3.3)."""
    return jax.random.permutation(sub, n_agents)


def respawn_key(sub, agent_idx):
    """Place-event key for in-step respawn of agent ``agent_idx`` (SPEC §4)."""
    return fold_in(sub, 1000 + agent_idx)


def autoreset_key(next_key):
    """Key feeding the fresh episode in ``step_autoreset`` (SPEC §9)."""
    return fold_in(next_key, 0xA110)


def place_event_draws(k, max_tries: int, x0, rw, y0, rh):
    """The (xs, ys) candidate streams of a place event (SPEC §4).

    ``x0, rw, y0, rh`` may be ints or traced scalars; shapes are static.
    """
    xs = jax.random.randint(fold_in(k, 0), (max_tries,), x0, x0 + rw,
                            dtype=jnp.int32)
    ys = jax.random.randint(fold_in(k, 1), (max_tries,), y0, y0 + rh,
                            dtype=jnp.int32)
    return xs, ys


def place_event_dir(k):
    """Random initial direction drawn by an *agent* place event (SPEC §4)."""
    return jax.random.randint(fold_in(k, 2), (), 0, 4, dtype=jnp.int32)


# --------------------------------------------------------------------------
# Bulk draw helpers — produce, in ONE jitted call, exactly the values the
# per-event helpers above produce. Used by the oracle so a reset / step costs
# O(1) host<->device round-trips instead of O(events) eager dispatches (this
# host's virtualization has multi-ms scheduling jitter; see tests/conftest).
# --------------------------------------------------------------------------

def all_reset_draws(key, n_events: int, max_tries: int, x0, rw, y0, rh,
                    width, height):
    """Per-event candidate streams for a whole reset (SPEC §4 event order).

    Returns (k_state, xs (E, T), ys (E, T), dirs (E,), split_x, door_y) —
    split_x/door_y are the doorkey scenario's event-0 sub-draws (ignored by
    other scenarios).
    """
    k_events, k_state = jax.random.split(key)
    ks = jax.vmap(lambda e: fold_in(k_events, e))(jnp.arange(n_events))
    xs, ys = jax.vmap(
        lambda k: place_event_draws(k, max_tries, x0, rw, y0, rh))(ks)
    dirs = jax.vmap(place_event_dir)(ks)
    k0 = fold_in(k_events, 0)
    split_x = jax.random.randint(fold_in(k0, 0), (), 2, width - 2,
                                 dtype=jnp.int32)
    door_y = jax.random.randint(fold_in(k0, 1), (), 1, height - 1,
                                dtype=jnp.int32)
    return k_state, xs, ys, dirs, split_x, door_y


def all_step_draws(key, n_agents: int, max_tries: int, x0, rw, y0, rh,
                   with_respawn: bool):
    """One step's draws: (next_key, perm[, respawn xs/ys/dirs per agent])."""
    k_next, sub = split_step_key(key)
    perm = step_perm(sub, n_agents)
    if not with_respawn:
        return k_next, perm
    rks = jax.vmap(lambda i: respawn_key(sub, i))(jnp.arange(n_agents))
    rxs, rys = jax.vmap(
        lambda k: place_event_draws(k, max_tries, x0, rw, y0, rh))(rks)
    rdirs = jax.vmap(place_event_dir)(rks)
    return k_next, perm, rxs, rys, rdirs
