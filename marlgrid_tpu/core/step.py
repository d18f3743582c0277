"""The jitted multi-agent transition function (SPEC §5).

TPU-native replacement for the reference's Python per-agent step loop
(``marlgrid/base.py — §step``, SURVEY §3.3): the randomized-priority sequential
agent micro-loop is kept sequential (it is the conflict-resolution *spec*,
SURVEY §7.3 item 2) but each micro-step is straight-line masked array code —
all seven action outcomes are computed and selected with ``where`` instead of
data-dependent branches, which is what XLA wants. n_agents is tiny (≤8 in all
reference configs) so the loop is unrolled at trace time.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import constants as C
from . import rng
from .grid_gen import free_mask, interior_region, reset, select_cell
from .state import EnvParams, EnvState

_DIR_VEC = jnp.asarray(C.DIR_VEC)


def _agent_micro_step(params: EnvParams, state: EnvState, rew, i, actions,
                      sub):
    """One agent's action, applied to the running state (SPEC §5 step 2)."""
    action = actions[i]
    active = state.active[i]
    pos = state.agent_pos[i]
    d = state.agent_dir[i]
    N = params.n_agents

    # --- rotation -----------------------------------------------------------
    turn = (jnp.where(active & (action == C.RIGHT), 1, 0)
            - jnp.where(active & (action == C.LEFT), 1, 0))
    state.agent_dir = state.agent_dir.at[i].set((d + turn) % 4)

    # --- the forward cell (always in bounds: boards are wall-bordered) ------
    f = pos + _DIR_VEC[d]
    fx, fy = f[0], f[1]
    ft = state.grid_type[fx, fy]
    fc = state.grid_color[fx, fy]
    fs = state.grid_state[fx, fy]

    others = jnp.arange(N) != i
    at_f = ((state.agent_pos[:, 0] == fx) & (state.agent_pos[:, 1] == fy)
            & others)
    # ghost_mode: inactive agents are passable (SPEC §5 blocked-by-agent)
    blocking = at_f & (state.active if params.ghost_mode
                       else jnp.ones((N,), bool))
    blocked = blocking.any()

    # --- forward ------------------------------------------------------------
    moves = active & (action == C.FORWARD) & C.can_overlap(ft, fs) & ~blocked
    new_pos = jnp.where(moves, f, pos)

    on_goal = moves & (ft == C.GOAL)
    on_lava = moves & (ft == C.LAVA)
    on_bonus = moves & (ft == C.BONUS)

    r = (jnp.where(on_goal, params.goal_reward, 0.0)
         + jnp.where(on_lava, params.lava_penalty, 0.0))

    # bonus-tile cycle (SPEC §5; ``marlgrid/objects.py — §BonusTile`` [M])
    lb = state.last_bonus[i]
    b = fs
    first = lb < 0
    same = b == lb
    succ = b == (lb + 1) % max(params.n_bonus_tiles, 1)
    bonus_r = jnp.where(first | succ, params.bonus_reward,
                        jnp.where(same, 0.0, -params.bonus_penalty))
    r = r + jnp.where(on_bonus, bonus_r, 0.0)
    state.last_bonus = state.last_bonus.at[i].set(
        jnp.where(on_bonus & ~same, b, lb))

    deact = (on_goal & (not params.respawn)) | on_lava
    state.active = state.active.at[i].set(active & ~deact)

    # Commit the move BEFORE any respawn draw so the vacated cell counts as
    # free in the respawn's validity mask (matches the oracle's ordering).
    state.agent_pos = state.agent_pos.at[i].set(new_pos)

    if params.respawn:
        # In-step respawn after reaching a goal: a place event per SPEC §4.
        rk = rng.respawn_key(sub, i)
        rx, ry, ok = select_cell(params, rk, free_mask(state),
                                 interior_region(params))
        do = on_goal & ok
        state.agent_pos = state.agent_pos.at[i].set(
            jnp.where(do, jnp.stack([rx, ry]), new_pos))
        rdir = rng.place_event_dir(rk)
        state.agent_dir = state.agent_dir.at[i].set(
            jnp.where(do, rdir, state.agent_dir[i]))

    # --- pickup / drop / toggle (mutually exclusive by action code) ---------
    cty, cco, cst = state.carry_type[i], state.carry_color[i], \
        state.carry_state[i]
    pick = active & (action == C.PICKUP) & C.can_pickup(ft) & (cty == C.EMPTY)
    drop = active & (action == C.DROP) & (cty != C.EMPTY) & (ft == C.EMPTY) \
        & ~at_f.any()
    tog = active & (action == C.TOGGLE)
    door_tog = tog & (ft == C.DOOR)
    box_tog = tog & (ft == C.BOX)

    # door state machine (SPEC §5 toggle)
    has_key = (cty == C.KEY) & (cco == fc)
    new_door = jnp.where(
        fs == C.DOOR_LOCKED,
        jnp.where(has_key, C.DOOR_OPEN, C.DOOR_LOCKED),
        jnp.where(fs == C.DOOR_CLOSED, C.DOOR_OPEN, C.DOOR_CLOSED))
    bct, bcc = C.box_unpack(fs)

    cell_t = jnp.where(pick, C.EMPTY, jnp.where(drop, cty,
                       jnp.where(box_tog, bct, ft)))
    cell_c = jnp.where(pick, 0, jnp.where(drop, cco,
                       jnp.where(box_tog, bcc, fc)))
    cell_s = jnp.where(pick, 0, jnp.where(drop, cst,
                       jnp.where(door_tog, new_door,
                                 jnp.where(box_tog, 0, fs))))
    state.grid_type = state.grid_type.at[fx, fy].set(cell_t)
    state.grid_color = state.grid_color.at[fx, fy].set(cell_c)
    state.grid_state = state.grid_state.at[fx, fy].set(cell_s)

    state.carry_type = state.carry_type.at[i].set(
        jnp.where(pick, ft, jnp.where(drop, C.EMPTY, cty)))
    state.carry_color = state.carry_color.at[i].set(
        jnp.where(pick, fc, jnp.where(drop, 0, cco)))
    state.carry_state = state.carry_state.at[i].set(
        jnp.where(pick, fs, jnp.where(drop, 0, cst)))

    rew = rew.at[i].add(r)
    return state, rew


def step(params: EnvParams, state: EnvState, actions):
    """Pure transition: (state, actions) -> (state', rew (N,), done ()).

    Follows SPEC §5 exactly; observations are computed separately
    (``core/obs.py``) from the returned state.
    """
    N = params.n_agents
    actions = jnp.asarray(actions, jnp.int32)
    next_key, sub = rng.split_step_key(state.key)
    state.key = next_key
    perm = rng.step_perm(sub, N)

    rew = jnp.zeros((N,), jnp.float32)
    for j in range(N):  # static unroll; sequential priority (SURVEY §3.3)
        state, rew = _agent_micro_step(params, state, rew, perm[j], actions,
                                       sub)

    state.step_count = state.step_count + 1
    if params.reward_decay:
        decay = 1.0 - 0.9 * state.step_count.astype(jnp.float32) \
            / params.max_steps
        rew = rew * decay
    state.accum_reward = state.accum_reward + rew
    state.last_reward = rew

    done = (state.step_count >= params.max_steps) | ~state.active.any()
    return state, rew, done


def step_autoreset(params: EnvParams, state: EnvState, actions):
    """Vectorized-training variant (SPEC §9): fresh episode on done.

    Returns (state', rew, done, info) where state' is the reset state when the
    episode ended; rew/done and info's episode aggregates are the terminal
    step's.
    """
    stepped, rew, done = step(params, state, actions)
    fresh = reset(params, rng.autoreset_key(stepped.key))
    new_state = jax.tree.map(
        lambda a, b: jnp.where(jnp.reshape(done, (1,) * a.ndim), b, a)
        if a.ndim else jnp.where(done, b, a),
        stepped, fresh)
    info = {
        "episode_return": jnp.where(done, stepped.accum_reward.sum(), 0.0),
        "episode_length": jnp.where(done, stepped.step_count, 0),
    }
    return new_state, rew, done, info
