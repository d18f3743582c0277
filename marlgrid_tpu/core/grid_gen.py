"""Procedural grid generation under jit — reset-time board building.

TPU-native replacement for the reference's ``MultiGridEnv.reset`` /
``_gen_grid`` / ``place_obj`` path (``marlgrid/base.py — §reset/§place_obj``,
``marlgrid/envs/__init__.py — §_gen_grid``, SURVEY §3.2): the data-dependent
rejection loop becomes a fixed-budget batched draw + first-valid select
(SURVEY §7.3 item 3), so the whole reset is one jitted program and auto-reset
can run inside the vmapped step.

TPU shape of the event chain: placements are *sequential* by SPEC §4 (later
events see earlier occupancy), so the serial carry is kept as small as
possible — a packed uint32 bitmask of free cells (~8 words for a 15x15
board). Each event is a couple of tiny fused ops on the words; the board
layers are painted ONCE at the end from the recorded placements. No gathers,
no scatters (see core/dense.py), and all randomness comes from one bulk draw
(core/rng.py).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import constants as C
from . import dense as D
from . import rng
from .state import EnvParams, EnvState, zeros_state


def interior_region(params: EnvParams) -> Tuple[int, int, int, int]:
    """(x0, rw, y0, rh) of the wall-bordered interior (SPEC §6)."""
    return 1, params.width - 2, 1, params.height - 2


# --------------------------------------------------------------------------
# Packed free-cell bitmask ops (x-major flat index m = x * H + y)
# --------------------------------------------------------------------------

def n_words(params: EnvParams) -> int:
    return -(-params.width * params.height // 32)


def pack_mask(flat_mask) -> jax.Array:
    """(W*H,) bool -> (nw,) uint32 packed words (flat x-major indexing)."""
    M = flat_mask.shape[-1]
    nw = -(-M // 32)
    bits = jnp.zeros((nw * 32,), jnp.uint32).at[:M].set(
        flat_mask.astype(jnp.uint32))
    return (bits.reshape(nw, 32)
            << jnp.arange(32, dtype=jnp.uint32)).sum(-1, jnp.uint32)


def unpack_flat(words, M: int) -> jax.Array:
    """(nw,) uint32 -> (M,) bool, flat x-major."""
    bits = ((words[:, None] >> jnp.arange(32, dtype=jnp.uint32)) & 1)
    return bits.reshape(-1)[:M].astype(bool)


def word_test(words, idx) -> jax.Array:
    """Bit test words[idx//32] >> idx%32 for an (T,) index vector."""
    nw = words.shape[0]
    wsel = (idx // 32)[:, None] == jnp.arange(nw)[None, :]
    w = (wsel * words[None, :]).sum(-1, jnp.uint32)
    return ((w >> (idx % 32).astype(jnp.uint32)) & 1).astype(bool)


def word_clear(words, idx) -> jax.Array:
    """Clear bit ``idx`` (scalar) — the cell is now taken."""
    nw = words.shape[0]
    bit = jnp.where(jnp.arange(nw) == idx // 32,
                    jnp.uint32(1) << (idx % 32).astype(jnp.uint32),
                    jnp.uint32(0))
    return words & ~bit


def select_from_words(params: EnvParams, words, xs, ys):
    """One place event (SPEC §4): first valid of the candidate draws, else
    the first free cell in row-major (y, then x) order. Returns (x, y, ok)."""
    W, H = params.width, params.height
    M = W * H
    idx = xs * H + ys
    valid = word_test(words, idx)
    any_valid = valid.any()
    first = jnp.argmax(valid)
    # y-major fallback scan, done flat: rank cells by y*W+x and take the
    # free cell with the smallest rank (argmin returns its flat index m)
    bits = unpack_flat(words, M)
    ymajor_rank = (jnp.arange(M) % H) * W + jnp.arange(M) // H
    any_free = bits.any()
    m = jnp.argmin(jnp.where(bits, ymajor_rank, M + 1))
    fx = (m // H).astype(jnp.int32)
    fy = (m % H).astype(jnp.int32)
    x = jnp.where(any_valid, D.read_row(xs, first), fx)
    y = jnp.where(any_valid, D.read_row(ys, first), fy)
    return x, y, (any_valid | any_free)


def free_mask(params: EnvParams, state: EnvState) -> jax.Array:
    """(W*H,) bool — cells that are empty and agent-free (SPEC §4 validity).

    Used by in-step respawn events; reset uses the incremental word chain.
    """
    H = params.height
    m = state.grid_type == C.EMPTY
    M = m.shape[-1]
    flat_pos = state.agent_pos[:, 0] * H + state.agent_pos[:, 1]   # (N,)
    occ = (flat_pos[:, None] == jnp.arange(M)[None, :]).any(0)
    return m & ~occ


def select_cell(params: EnvParams, free, xs, ys):
    """Single place event against a fresh free mask (respawn path)."""
    return select_from_words(params, pack_mask(free), xs, ys)


def bordered_layers(params: EnvParams):
    """Fresh 2-D (W, H) board layers with the wall border
    (``MultiGrid.wall_rect``, SURVEY §2.1). Reset builds the board in 2-D
    and flattens into the state once at the end."""
    W, H = params.width, params.height
    g = jnp.zeros((W, H), jnp.int32)
    g = g.at[0, :].set(C.WALL).at[W - 1, :].set(C.WALL)
    g = g.at[:, 0].set(C.WALL).at[:, H - 1].set(C.WALL)
    gc = jnp.where(g == C.WALL, C.COLOR_TO_IDX["grey"], 0)
    gs = jnp.zeros((W, H), jnp.int32)
    return g, gc, gs


# --------------------------------------------------------------------------
# Scenario specs (SPEC §6). Each returns (state, events, agent_mask) where
# ``events`` is a list, one entry per placement event number, of either None
# (the event's draws are consumed but nothing is placed — doorkey's wall
# draw) or (type, color, obj_state, region_mask_or_None). Values may be
# traced; list structure is static.
# --------------------------------------------------------------------------

def gen_empty(params: EnvParams, layers, split_x, door_y):
    """EmptyMultiGrid (``marlgrid/envs/__init__.py — §EmptyMultiGrid`` [H])."""
    return layers, [(C.GOAL, C.COLOR_TO_IDX["green"], 0, None)], None


def gen_cluttered(params: EnvParams, layers, split_x, door_y):
    """ClutteredMultiGrid: n_clutter random walls + goal (SURVEY §2.1 [H])."""
    grey = C.COLOR_TO_IDX["grey"]
    events = [(C.WALL, grey, 0, None)] * params.n_clutter
    events.append((C.GOAL, C.COLOR_TO_IDX["green"], 0, None))
    return layers, events, None


def gen_doorkey(params: EnvParams, layers, split_x, door_y):
    """DoorKey-style env (SURVEY §2.1 door/key env [M]; SPEC §6)."""
    gt, gc, gs = layers
    W, H = params.width, params.height
    xs = jnp.arange(W)[:, None]
    ys = jnp.arange(H)[None, :]
    on_wall_col = (xs == split_x) & (ys >= 1) & (ys <= H - 2)
    grey = C.COLOR_TO_IDX["grey"]
    yellow = C.COLOR_TO_IDX["yellow"]
    gt = jnp.where(on_wall_col, C.WALL, gt)
    gc = jnp.where(on_wall_col, grey, gc)
    on_door = (xs == split_x) & (ys == door_y)
    gt = jnp.where(on_door, C.DOOR, gt)
    gc = jnp.where(on_door, yellow, gc)
    gs = jnp.where(on_door, C.DOOR_LOCKED, gs)
    left = (xs < split_x) & jnp.ones((1, H), bool)
    right = (xs > split_x) & jnp.ones((1, H), bool)
    events = [
        None,  # event 0: the split/door draw itself
        (C.KEY, yellow, 0, left),
        (C.GOAL, C.COLOR_TO_IDX["green"], 0, right),
    ]
    return (gt, gc, gs), events, left


def gen_goal_cycle(params: EnvParams, layers, split_x, door_y):
    """ClutteredGoalCycleEnv: clutter + cyclic BonusTiles (SURVEY §2.1 [M])."""
    grey = C.COLOR_TO_IDX["grey"]
    pink = C.COLOR_TO_IDX["pink"]
    events = [(C.WALL, grey, 0, None)] * params.n_clutter
    events += [(C.BONUS, pink, b, None) for b in range(params.n_bonus_tiles)]
    return layers, events, None


SCENARIOS: Dict[str, Callable] = {
    "empty": gen_empty,
    "cluttered": gen_cluttered,
    "doorkey": gen_doorkey,
    "goal_cycle": gen_goal_cycle,
}

_N_EVENTS: Dict[str, Callable] = {
    "empty": lambda p: 1,
    "cluttered": lambda p: p.n_clutter + 1,
    "doorkey": lambda p: 3,
    "goal_cycle": lambda p: p.n_clutter + p.n_bonus_tiles,
}

#: scenario name -> oracle-side builder (OracleEnv method-style callable);
#: populated by register_scenario for custom scenarios
ORACLE_SCENARIOS: Dict[str, Callable] = {}

#: scenario name -> static tuple of every (type, color, s_vis) cell
#: appearance the scenario can ever show (s_vis = door state for doors,
#: else 0). Used by the Pallas sprite-composite obs kernel (ops/sprite.py)
#: to shrink its per-cell palette; a scenario without an entry falls back
#: to the full-LUT XLA path. EMPTY and the grey wall border are implied.
SCENARIO_PALETTES: Dict[str, Tuple] = {
    "empty": ((C.GOAL, 3, 0),),                     # green goal
    "cluttered": ((C.GOAL, 3, 0),),
    "doorkey": ((C.DOOR, 2, 0), (C.DOOR, 2, 1), (C.DOOR, 2, 2),
                (C.KEY, 2, 0), (C.GOAL, 3, 0)),     # yellow door/key
    "goal_cycle": ((C.BONUS, 6, 0),),               # pink bonus tiles
}


def register_scenario(name: str, builder: Callable, n_events,
                      oracle_builder: Callable = None,
                      palette: Tuple = None) -> str:
    """Register a custom scenario — the TPU-native analog of subclassing
    ``MultiGridEnv`` and overriding ``_gen_grid`` (``marlgrid/base.py —
    §_gen_grid`` hook, SURVEY §3.2).

    ``builder(params, layers, split_x, door_y) -> (layers, events,
    agent_mask)`` follows the builtin builders above; ``events`` entries may
    be ``(type, color, state, mask_or_None)`` tuples, ``WorldObj`` instances
    from ``marlgrid_tpu.objects`` (placed anywhere), ``(WorldObj, mask)``
    pairs, or None (draw consumed, nothing placed). ``n_events`` is an int
    or ``f(params) -> int`` and must be static per config (jit constant).
    ``oracle_builder(oracle_env)`` optionally mirrors the placement event
    sequence on the pure-Python oracle so custom scenarios stay
    parity-testable; it returns the agent spawn mask (or None).
    ``palette`` optionally lists every (type, color, s_vis) appearance the
    scenario can show (see SCENARIO_PALETTES) to enable the Pallas
    sprite-composite obs fast path for the custom scenario.
    """
    SCENARIOS[name] = builder
    _N_EVENTS[name] = n_events if callable(n_events) else (
        lambda p, _n=n_events: _n)
    if oracle_builder is not None:
        ORACLE_SCENARIOS[name] = oracle_builder
    if palette is not None:
        SCENARIO_PALETTES[name] = tuple(palette)
    return name


def encode_obj_cell(obj, params: EnvParams = None):
    """(type, color, state) cell triple of a WorldObj under ``params``,
    honoring per-object rewards (``marlgrid/objects.py — §Goal(reward)`` [H],
    ``§BonusTile(reward, penalty)`` [M]).

    A ``Goal(reward=r)`` maps r to an index into ``params.goal_rewards``
    (stored in the cell's state field, which the step engine pays out);
    a ``BonusTile``'s reward/penalty are validated against the per-tile
    tables (indexed by its bonus_id). Raises ValueError with a fix-it
    message when the object's reward is not representable under params.
    """
    t, c, s = obj.encode()
    if params is None:
        return (t, c, s)
    # objects constructed without an explicit reward defer to the env's
    # uniform goal_reward/bonus_reward (Goal() keeps working under any
    # EnvParams; only Goal(reward=r) binds to the goal_rewards table)
    if not getattr(obj, "explicit_reward", True):
        if t == C.GOAL and params.goal_rewards:
            # with a goal_rewards table set the engine pays
            # goal_rewards[state], so a bare Goal() must encode the
            # uniform goal_reward's table index — state 0 would silently
            # pay goal_rewards[0] instead
            try:
                s = params.goal_rewards.index(float(params.goal_reward))
            except ValueError:
                raise ValueError(
                    f"Goal() defers to the uniform goal_reward="
                    f"{params.goal_reward}, which is not in "
                    f"EnvParams.goal_rewards={params.goal_rewards}; add it "
                    f"to the table or construct Goal(reward=...) "
                    f"explicitly") from None
        return (t, c, s)
    r = getattr(obj, "reward", None)
    if t == C.GOAL and r is not None:
        r = float(r)
        if params.goal_rewards:
            try:
                s = params.goal_rewards.index(r)
            except ValueError:
                raise ValueError(
                    f"Goal(reward={r}) placed but {r} is not in "
                    f"EnvParams.goal_rewards={params.goal_rewards}; add it "
                    f"to the table") from None
        elif r != params.goal_reward:
            raise ValueError(
                f"Goal(reward={r}) placed but EnvParams pays the uniform "
                f"goal_reward={params.goal_reward}; set "
                f"goal_rewards=({params.goal_reward}, {r}, …) on EnvParams "
                f"and this goal will be encoded as an index into it")
    if t == C.BONUS:
        rew = float(getattr(obj, "reward", params.bonus_reward))
        pen = float(getattr(obj, "penalty", params.bonus_penalty))
        table_rew = (params.bonus_rewards[s] if params.bonus_rewards
                     else params.bonus_reward)
        table_pen = (params.bonus_penalties[s] if params.bonus_penalties
                     else params.bonus_penalty)
        if rew != table_rew or pen != table_pen:
            raise ValueError(
                f"BonusTile(bonus_id={s}, reward={rew}, penalty={pen}) does "
                f"not match what EnvParams pays for tile {s} "
                f"(reward={table_rew}, penalty={table_pen}); set "
                f"bonus_rewards/bonus_penalties tuples (indexed by "
                f"bonus_id) on EnvParams")
    return (t, c, s)


def normalize_event(ev, params: EnvParams = None):
    """Event entry -> (type, color, state, mask_or_None) or None."""
    if ev is None:
        return None
    if isinstance(ev, tuple) and len(ev) == 4:
        return ev
    if isinstance(ev, tuple) and len(ev) == 2:   # (WorldObj, mask)
        obj, mask = ev
        return encode_obj_cell(obj, params) + (mask,)
    return encode_obj_cell(ev, params) + (None,)  # bare WorldObj


def n_scenario_events(params: EnvParams) -> int:
    return _N_EVENTS[params.scenario](params)


def agent_spawn_region_mask(params: EnvParams):
    """(W, H) numpy bool of the static agent spawn rectangle, or None when
    unconstrained (``MultiGridEnv(agent_spawn_kwargs)`` [M]: the reference
    forwards top/size into per-agent ``place_obj`` calls; here the
    rectangle is a static jit constant ANDed into the placement mask)."""
    import numpy as np

    if params.agent_spawn_size is None and params.agent_spawn_top == (0, 0):
        return None
    x0, y0 = params.agent_spawn_top
    if params.agent_spawn_size is None:
        x1, y1 = params.width, params.height
    else:
        x1 = min(x0 + params.agent_spawn_size[0], params.width)
        y1 = min(y0 + params.agent_spawn_size[1], params.height)
    m = np.zeros((params.width, params.height), bool)
    m[x0:x1, y0:y1] = True
    return m


def reset(params: EnvParams, key) -> EnvState:
    """Full episode reset (SPEC §6): border → scenario events → agent events.

    One bulk draw; a packed-bitmask serial chain over events; one final
    paint of the board layers.
    """
    W, H, N = params.width, params.height, params.n_agents
    E = n_scenario_events(params) + N
    x0, rw, y0, rh = interior_region(params)
    k_state, xs, ys, dirs, split_x, door_y = rng.reset_draws(
        key, E, params.max_place_tries, x0, rw, y0, rh, W, H)

    state = zeros_state(params, k_state)
    layers = bordered_layers(params)
    layers, events, agent_mask = SCENARIOS[params.scenario](params, layers,
                                                           split_x, door_y)
    gt, gc, gs = layers
    assert len(events) == n_scenario_events(params)

    words = pack_mask((gt == C.EMPTY).reshape(-1))
    placed = []  # (x, y, ok, type, color, obj_state) of painted objects
    for e, ev in enumerate(events):
        ev = normalize_event(ev, params)
        if ev is None:
            continue
        otype, ocolor, ostate, mask = ev
        w = words if mask is None else words & pack_mask(mask.reshape(-1))
        x, y, ok = select_from_words(params, w, xs[e], ys[e])
        words = jnp.where(ok, word_clear(words, x * H + y), words)
        placed.append((x, y, ok, otype, ocolor, ostate))

    base = len(events)
    region = agent_spawn_region_mask(params)
    if region is not None:
        region = jnp.asarray(region)
        agent_mask = region if agent_mask is None else (agent_mask & region)
    for i in range(N):
        e = base + i
        w = words if agent_mask is None else \
            words & pack_mask(agent_mask.reshape(-1))
        x, y, ok = select_from_words(params, w, xs[e], ys[e])
        # degenerate full-board fallback pins agents at (1, 1) (SPEC §4)
        x = jnp.where(ok, x, 1)
        y = jnp.where(ok, y, 1)
        words = word_clear(words, x * H + y)
        state.agent_pos = state.agent_pos.at[i].set(jnp.stack([x, y]))
        state.agent_dir = state.agent_dir.at[i].set(dirs[e])
        # delayed agents (spawn_delay [L]) are placed but start inactive
        state.active = state.active.at[i].set(
            params.spawn_delay_tuple()[i] == 0)

    if placed:
        # one dense paint: all placed cells are distinct by construction
        px = jnp.stack([p[0] for p in placed])          # (K,)
        py = jnp.stack([p[1] for p in placed])
        pok = jnp.stack([p[2] for p in placed])
        pt = jnp.stack([jnp.asarray(p[3], jnp.int32) for p in placed])
        pc = jnp.stack([jnp.asarray(p[4], jnp.int32) for p in placed])
        ps = jnp.stack([jnp.asarray(p[5], jnp.int32) for p in placed])
        cell = (((px[:, None, None] == jnp.arange(W)[None, :, None])
                 & (py[:, None, None] == jnp.arange(H)[None, None, :]))
                & pok[:, None, None])                   # (K, W, H)
        hit = cell.any(0)
        paint = lambda v: (cell * v[:, None, None]).sum(0)  # noqa: E731
        gt = jnp.where(hit, paint(pt), gt)
        gc = jnp.where(hit, paint(pc), gc)
        gs = jnp.where(hit, paint(ps), gs)
    # flatten into the state's TPU-friendly layout (see EnvState docstring)
    state.grid_type = gt.reshape(-1).astype(jnp.uint8)
    state.grid_color = gc.reshape(-1).astype(jnp.uint8)
    state.grid_state = gs.reshape(-1).astype(jnp.uint8)
    return state
