"""Procedural grid generation under jit — reset-time board building.

TPU-native replacement for the reference's ``MultiGridEnv.reset`` /
``_gen_grid`` / ``place_obj`` path (``marlgrid/base.py — §reset/§place_obj``,
``marlgrid/envs/__init__.py — §_gen_grid``, SURVEY §3.2): the data-dependent
rejection loop becomes a fixed-budget batched draw + first-valid select
(SURVEY §7.3 item 3), so the whole reset is one jitted program and auto-reset
can run inside the vmapped step.

Every random draw follows SPEC §4; the oracle mirrors these event orders
exactly.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import constants as C
from . import rng
from .state import EnvParams, EnvState, zeros_state


def interior_region(params: EnvParams) -> Tuple[int, int, int, int]:
    """(x0, rw, y0, rh) of the wall-bordered interior (SPEC §6)."""
    return 1, params.width - 2, 1, params.height - 2


def free_mask(state: EnvState, extra_mask=None) -> jax.Array:
    """(W, H) bool — cells that are empty and agent-free (SPEC §4 validity)."""
    m = state.grid_type == C.EMPTY
    # Exclude cells occupied by any *placed* agent. Unplaced agents sit at
    # (0, 0), a border-wall cell that is never free anyway.
    W, H = m.shape
    occ = jnp.zeros((W, H), bool)
    occ = occ.at[state.agent_pos[:, 0], state.agent_pos[:, 1]].set(True)
    m = m & ~occ
    if extra_mask is not None:
        m = m & extra_mask
    return m


def select_cell(params: EnvParams, k, free: jax.Array,
                region: Tuple) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One place event (SPEC §4): returns (x, y, placed).

    Draws ``max_place_tries`` candidates in the region, picks the first valid
    one; falls back to the first free cell in row-major (y, then x) order.
    """
    x0, rw, y0, rh = region
    xs, ys = rng.place_event_draws(k, params.max_place_tries, x0, rw, y0, rh)
    valid = free[xs, ys]
    any_valid = valid.any()
    first = jnp.argmax(valid)
    # Row-major (y, then x) fallback scan over the whole board, restricted to
    # the free mask (which already encodes the scenario region/mask).
    flat = free.T.reshape(-1)  # (H*W,) scanning y-major
    any_free = flat.any()
    fidx = jnp.argmax(flat)
    W = free.shape[0]
    fx = (fidx % W).astype(jnp.int32)
    fy = (fidx // W).astype(jnp.int32)
    x = jnp.where(any_valid, xs[first], fx)
    y = jnp.where(any_valid, ys[first], fy)
    return x, y, (any_valid | any_free)


def set_cell(state: EnvState, x, y, otype, ocolor=0, ostate=0) -> EnvState:
    state.grid_type = state.grid_type.at[x, y].set(otype)
    state.grid_color = state.grid_color.at[x, y].set(ocolor)
    state.grid_state = state.grid_state.at[x, y].set(ostate)
    return state


def place_object(params: EnvParams, state: EnvState, k, otype, ocolor=0,
                 ostate=0, mask=None) -> EnvState:
    """place_obj-equivalent for world objects (SURVEY §3.2 hot spot)."""
    x, y, ok = select_cell(params, k, free_mask(state, mask),
                           interior_region(params))
    t = jnp.where(ok, otype, state.grid_type[x, y])
    c = jnp.where(ok, ocolor, state.grid_color[x, y])
    s = jnp.where(ok, ostate, state.grid_state[x, y])
    return set_cell(state, x, y, t, c, s)


def place_agent(params: EnvParams, state: EnvState, i: int, k,
                mask=None) -> EnvState:
    """Agent place event: position + random initial dir (SPEC §4)."""
    x, y, ok = select_cell(params, k, free_mask(state, mask),
                           interior_region(params))
    # degenerate full-board fallback pins agents at (1, 1) (SPEC §4)
    x = jnp.where(ok, x, 1)
    y = jnp.where(ok, y, 1)
    state.agent_pos = state.agent_pos.at[i].set(jnp.stack([x, y]))
    state.agent_dir = state.agent_dir.at[i].set(rng.place_event_dir(k))
    state.active = state.active.at[i].set(True)
    return state


def make_border(state: EnvState) -> EnvState:
    """Wall border around the board (``MultiGrid.wall_rect``, SURVEY §2.1)."""
    W, H = state.grid_type.shape
    g = state.grid_type
    g = g.at[0, :].set(C.WALL).at[W - 1, :].set(C.WALL)
    g = g.at[:, 0].set(C.WALL).at[:, H - 1].set(C.WALL)
    state.grid_type = g
    state.grid_color = jnp.where(g == C.WALL, C.COLOR_TO_IDX["grey"],
                                 state.grid_color)
    return state


# --------------------------------------------------------------------------
# Scenario generators (SPEC §6). Each returns (state, n_events, agent_mask).
# Python loops below have static trip counts -> unrolled at trace time.
# --------------------------------------------------------------------------

def gen_empty(params: EnvParams, state: EnvState, ke):
    """EmptyMultiGrid (``marlgrid/envs/__init__.py — §EmptyMultiGrid`` [H])."""
    state = place_object(params, state, rng.fold_in(ke, 0), C.GOAL,
                         C.COLOR_TO_IDX["green"])
    return state, 1, None


def gen_cluttered(params: EnvParams, state: EnvState, ke):
    """ClutteredMultiGrid: n_clutter random walls + goal (SURVEY §2.1 [H])."""
    for e in range(params.n_clutter):
        state = place_object(params, state, rng.fold_in(ke, e), C.WALL,
                             C.COLOR_TO_IDX["grey"])
    state = place_object(params, state, rng.fold_in(ke, params.n_clutter),
                         C.GOAL, C.COLOR_TO_IDX["green"])
    return state, params.n_clutter + 1, None


def gen_doorkey(params: EnvParams, state: EnvState, ke):
    """DoorKey-style env (SURVEY §2.1 door/key env [M]; SPEC §6)."""
    W, H = params.width, params.height
    k0 = rng.fold_in(ke, 0)
    split_x = jax.random.randint(rng.fold_in(k0, 0), (), 2, W - 2,
                                 dtype=jnp.int32)
    door_y = jax.random.randint(rng.fold_in(k0, 1), (), 1, H - 1,
                                dtype=jnp.int32)
    xs = jnp.arange(W)[:, None]
    ys = jnp.arange(H)[None, :]
    on_wall_col = (xs == split_x) & (ys >= 1) & (ys <= H - 2)
    state.grid_type = jnp.where(on_wall_col, C.WALL, state.grid_type)
    state.grid_color = jnp.where(on_wall_col, C.COLOR_TO_IDX["grey"],
                                 state.grid_color)
    yellow = C.COLOR_TO_IDX["yellow"]
    state = set_cell(state, split_x, door_y, C.DOOR, yellow, C.DOOR_LOCKED)
    left = xs < split_x
    right = xs > split_x
    state = place_object(params, state, rng.fold_in(ke, 1), C.KEY, yellow,
                         mask=left)
    state = place_object(params, state, rng.fold_in(ke, 2), C.GOAL,
                         C.COLOR_TO_IDX["green"], mask=right)
    return state, 3, left


def gen_goal_cycle(params: EnvParams, state: EnvState, ke):
    """ClutteredGoalCycleEnv: clutter + cyclic BonusTiles (SURVEY §2.1 [M])."""
    for e in range(params.n_clutter):
        state = place_object(params, state, rng.fold_in(ke, e), C.WALL,
                             C.COLOR_TO_IDX["grey"])
    pink = C.COLOR_TO_IDX["pink"]
    for b in range(params.n_bonus_tiles):
        state = place_object(params, state,
                             rng.fold_in(ke, params.n_clutter + b),
                             C.BONUS, pink, ostate=b)
    return state, params.n_clutter + params.n_bonus_tiles, None


SCENARIOS: Dict[str, Callable] = {
    "empty": gen_empty,
    "cluttered": gen_cluttered,
    "doorkey": gen_doorkey,
    "goal_cycle": gen_goal_cycle,
}


def reset(params: EnvParams, key) -> EnvState:
    """Full episode reset (SPEC §6): border → scenario events → agent events.

    Key schedule: ``k_events, k_state = split(key)``; placement event ``e``
    uses ``fold_in(k_events, e)``; the post-reset state carries ``k_state``.
    """
    k_events, k_state = jax.random.split(key)
    state = zeros_state(params, k_state)
    state = make_border(state)
    state, n_ev, agent_mask = SCENARIOS[params.scenario](params, state,
                                                         k_events)
    for i in range(params.n_agents):
        state = place_agent(params, state, i, rng.fold_in(k_events, n_ev + i),
                            mask=agent_mask)
    return state
