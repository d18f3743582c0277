"""The jitted multi-agent transition function (SPEC §5).

TPU-native replacement for the reference's Python per-agent step loop
(``marlgrid/base.py — §step``, SURVEY §3.3): the randomized-priority
sequential agent micro-loop is kept sequential (it is the conflict-resolution
*spec*, SURVEY §7.3 item 2) but each micro-step is straight-line masked array
code — all seven action outcomes are computed and selected with ``where``,
and every dynamic grid/agent access goes through ``core.dense`` one-hot
arithmetic instead of gathers/scatters (vmapped dynamic-index gathers
serialize on TPU; see dense.py). n_agents is tiny (≤8 in all reference
configs) so the loop is unrolled at trace time.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import constants as C
from . import dense as D
from . import rng
from .grid_gen import free_mask, interior_region, reset, select_cell
from .state import EnvParams, EnvState

# NOTE: no module-level jnp constants — creating a device array at import
# time initializes the XLA backend, which breaks the CLI's
# ``jax.distributed.initialize()`` (must run before any backend touch).


def _float_lookup(table, idx):
    """table[idx] for a static float tuple, gather-free (D.table_lookup
    accumulates through int32 and would truncate float rewards)."""
    t = jnp.asarray(table, jnp.float32)
    return ((idx[..., None] == jnp.arange(t.shape[0])) * t).sum(-1)


def _read_cell3(params: EnvParams, state: EnvState, x, y):
    """(type, color, state) of one cell, gather-free, on the FLAT layers
    (flat one-hots pad to ~256 lanes vs 8.5x padding for (W, H) forms)."""
    sel = D.onehot(x * params.height + y, params.width * params.height)
    return ((state.grid_type * sel).sum(-1),
            (state.grid_color * sel).sum(-1),
            (state.grid_state * sel).sum(-1))


def _agent_micro_step(params: EnvParams, state: EnvState, rew, i, actions,
                      respawn_draws):
    """One agent's action, applied to the running state (SPEC §5 step 2)."""
    action = D.read_row(actions, i)
    active = D.read_row(state.active, i)
    pos = D.read_row(state.agent_pos, i)
    d = D.read_row(state.agent_dir, i)
    N = params.n_agents

    # --- rotation -----------------------------------------------------------
    turn = (jnp.where(active & (action == C.RIGHT), 1, 0)
            - jnp.where(active & (action == C.LEFT), 1, 0))
    state.agent_dir = D.write_row(state.agent_dir, i, (d + turn) % 4)

    # --- the forward cell (always in bounds: boards are wall-bordered) ------
    f = pos + (D.onehot(d, 4)[:, None]
           * jnp.asarray(C.DIR_VEC)).sum(0)
    fx, fy = f[0], f[1]
    ft, fc, fs = _read_cell3(params, state, fx, fy)

    others = jnp.arange(N) != i
    at_f = ((state.agent_pos[:, 0] == fx) & (state.agent_pos[:, 1] == fy)
            & others)
    # ghost_mode: inactive agents are passable (SPEC §5 blocked-by-agent)
    blocking = at_f & (state.active if params.ghost_mode
                       else jnp.ones((N,), bool))
    blocked = blocking.any()

    # --- forward ------------------------------------------------------------
    can_overlap = (D.table_lookup(C.CAN_OVERLAP_BASE, ft)
                   | ((ft == C.DOOR) & (fs == C.DOOR_OPEN)))
    moves = active & (action == C.FORWARD) & can_overlap & ~blocked
    new_pos = jnp.where(moves, f, pos)

    on_goal = moves & (ft == C.GOAL)
    on_lava = moves & (ft == C.LAVA)
    on_bonus = moves & (ft == C.BONUS)

    # per-object goal rewards (``marlgrid/objects.py — §Goal(reward)`` [H]):
    # the goal cell's state field indexes the static table when one is set
    if params.goal_rewards:
        goal_r = _float_lookup(params.goal_rewards, fs)
    else:
        goal_r = params.goal_reward
    r = (jnp.where(on_goal, goal_r, 0.0)
         + jnp.where(on_lava, params.lava_penalty, 0.0))

    # bonus-tile cycle (SPEC §5; ``marlgrid/objects.py — §BonusTile`` [M]);
    # per-tile magnitudes indexed by the stepped-on tile's bonus_id when
    # tables are set (``§BonusTile(reward, penalty)`` [M])
    lb = D.read_row(state.last_bonus, i)
    b = fs
    first = lb < 0
    same = b == lb
    succ = b == (lb + 1) % max(params.n_bonus_tiles, 1)
    b_rew = _float_lookup(params.bonus_rewards, b) \
        if params.bonus_rewards else params.bonus_reward
    b_pen = _float_lookup(params.bonus_penalties, b) \
        if params.bonus_penalties else params.bonus_penalty
    bonus_r = jnp.where(first | succ, b_rew,
                        jnp.where(same, 0.0, -b_pen))
    r = r + jnp.where(on_bonus, bonus_r, 0.0)
    state.last_bonus = D.write_row(state.last_bonus, i,
                                   jnp.where(on_bonus & ~same, b, lb))
    # cycle bookkeeping (``ClutteredGoalCycleEnv(reset_on_cycle)`` [L],
    # SPEC §5): an in-order rewarded visit extends the chain, a wrong-order
    # visit restarts it at the visited tile; n_bonus_tiles consecutive
    # in-order visits complete one cycle.
    prog = D.read_row(state.cycle_progress, i)
    new_prog = jnp.where(on_bonus & (first | succ), prog + 1,
                         jnp.where(on_bonus & ~same, 1, prog))
    completed = on_bonus & (new_prog >= params.n_bonus_tiles)
    state.cycle_progress = D.write_row(state.cycle_progress, i,
                                       jnp.where(completed, 0, new_prog))
    state.cycles = D.write_row(state.cycles, i,
                               D.read_row(state.cycles, i)
                               + completed.astype(jnp.int32))

    deact = (on_goal & (not params.respawn)) | on_lava
    state.active = D.write_row(state.active, i, active & ~deact)

    # Commit the move BEFORE any respawn draw so the vacated cell counts as
    # free in the respawn's validity mask (matches the oracle's ordering).
    state.agent_pos = D.write_row(state.agent_pos, i, new_pos)

    if params.respawn:
        # In-step respawn after reaching a goal: a place event per SPEC §4.
        rxs, rys, rdirs = respawn_draws
        rx, ry, ok = select_cell(params, free_mask(params, state),
                                 D.read_row(rxs, i), D.read_row(rys, i))
        do = on_goal & ok
        state.agent_pos = D.write_row(
            state.agent_pos, i, jnp.where(do, jnp.stack([rx, ry]), new_pos))
        state.agent_dir = D.write_row(
            state.agent_dir, i,
            jnp.where(do, D.read_row(rdirs, i),
                      D.read_row(state.agent_dir, i)))

    # --- pickup / drop / toggle (mutually exclusive by action code) ---------
    cty = D.read_row(state.carry_type, i)
    cco = D.read_row(state.carry_color, i)
    cst = D.read_row(state.carry_state, i)
    pick = active & (action == C.PICKUP) \
        & D.table_lookup(C.CAN_PICKUP, ft) & (cty == C.EMPTY)
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
    sel = jnp.arange(params.width * params.height) == fx * params.height + fy
    state.grid_type = jnp.where(sel, cell_t.astype(jnp.uint8),
                                state.grid_type)
    state.grid_color = jnp.where(sel, cell_c.astype(jnp.uint8),
                                 state.grid_color)
    state.grid_state = jnp.where(sel, cell_s.astype(jnp.uint8),
                                 state.grid_state)

    state.carry_type = D.write_row(
        state.carry_type, i,
        jnp.where(pick, ft, jnp.where(drop, C.EMPTY, cty)))
    state.carry_color = D.write_row(
        state.carry_color, i,
        jnp.where(pick, fc, jnp.where(drop, 0, cco)))
    state.carry_state = D.write_row(
        state.carry_state, i,
        jnp.where(pick, fs, jnp.where(drop, 0, cst)))

    rew = rew + r * D.onehot(i, N, rew.dtype)
    return state, rew


def step(params: EnvParams, state: EnvState, actions):
    """Pure transition: (state, actions) -> (state', rew (N,), done ()).

    Follows SPEC §5 exactly; observations are computed separately
    (``core/obs.py``) from the returned state.
    """
    N = params.n_agents
    actions = jnp.asarray(actions, jnp.int32)
    if params.has_spawn_delays:
        # delayed spawns (``GridAgentInterface(spawn_delay)`` [L], SPEC §5):
        # agent i activates at the start of the step whose pre-step
        # step_count equals its delay (placed at reset, hidden until then)
        dl = jnp.asarray(params.spawn_delay_tuple(), jnp.int32)
        state.active = state.active | ((dl > 0) & (dl == state.step_count))
    x0, rw, y0, rh = interior_region(params)
    draws = rng.step_draws(state.key, N, params.max_place_tries, x0, rw,
                           y0, rh, with_respawn=params.respawn)
    state.key, perm = draws[0], draws[1]
    respawn_draws = draws[2:] if params.respawn else None

    rew = jnp.zeros((N,), jnp.float32)
    pre_cycles = state.cycles
    for j in range(N):  # static unroll; sequential priority (SURVEY §3.3)
        state, rew = _agent_micro_step(params, state, rew, perm[j], actions,
                                       respawn_draws)

    state.step_count = state.step_count + 1
    if params.reward_decay:
        decay = 1.0 - 0.9 * state.step_count.astype(jnp.float32) \
            / params.max_steps
        rew = rew * decay
    state.accum_reward = state.accum_reward + rew
    state.last_reward = rew
    # prestige display accumulator (SPEC §8): decay, then add this step's
    # non-negative reward (beta may differ per agent — (N,) broadcast)
    state.prestige = (state.prestige
                      * jnp.asarray(params.prestige_beta_tuple(),
                                    jnp.float32)
                      + jnp.maximum(rew, 0.0))

    alive = state.active
    if params.has_spawn_delays:
        # not-yet-spawned agents keep the episode alive (SPEC §5.5b).
        # step_count is post-increment here; an agent with dl == step_count
        # activates at the START of the next step (pre-step count == dl), so
        # pending is dl >= step_count, not dl > step_count.
        dl = jnp.asarray(params.spawn_delay_tuple(), jnp.int32)
        alive = alive | ((dl > 0) & (dl >= state.step_count))
    done = (state.step_count >= params.max_steps) | ~alive.any()
    if params.reset_on_cycle:
        done = done | (state.cycles > pre_cycles).any()
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
        "episode_cycles": jnp.where(done, stepped.cycles.sum(), 0),
    }
    return new_state, rew, done, info


def step_autoreset_batch(params: EnvParams, state: EnvState, actions):
    """Batch-level autoreset (SPEC §9, shared-board variant): vmapped step +
    ONE fresh board per step, selected into every env that finished.

    Per-env fresh boards (``step_autoreset``) regenerate B boards per step of
    which only the ~B/max_steps done ones are used — at batch 4096 that made
    reset generation the single largest step cost. Here the fresh board is
    generated once (keyed off env 0's post-step key) and every reset env gets
    it, with a distinct re-derived step key so their subsequent RNG streams
    diverge. Envs finishing on the same step share a layout; they diverge
    from the first post-reset action.

    ``state``/``actions`` are batched (B, …); returns (state, rew, done,
    info) batched.
    """
    stepped, rew, done = jax.vmap(
        lambda s, a: step(params, s, a))(state, actions)
    fresh = reset(params, rng.autoreset_key(stepped.key[0]))
    return _select_fresh(stepped, rew, done, fresh)


def step_autoreset_with_fresh(params: EnvParams, state: EnvState, actions,
                              fresh: EnvState, env_offset=0):
    """Shared-board autoreset with a caller-provided fresh board.

    Rollout loops pre-generate one fresh board per scan step (a single
    vmapped reset OUTSIDE the scan) and pass board t here at step t — inside
    the scan only the cheap select/re-key remains. An unbatched reset inside
    the scan body is pure serial kernel-launch overhead; a per-env batched
    one regenerates B boards to use ~B/max_steps of them.

    ``env_offset``: index of this batch's first env in the GLOBAL batch —
    shard_map callers pass ``axis_index * B_local`` so post-reset RNG
    streams stay distinct across shards (each shard re-keys envs by global
    index; with a replicated fresh board, local indexing would give env i
    of every shard an identical stream).
    """
    stepped, rew, done = jax.vmap(
        lambda s, a: step(params, s, a))(state, actions)
    return _select_fresh(stepped, rew, done, fresh, env_offset)


def fresh_pool_tiled(params: EnvParams, key, n_pool: int, batch: int):
    """Batched fresh boards from a K-layout pool: (batch, …) EnvState where
    env i carries layout ``i % n_pool``.

    The shared-board autoreset (one fresh layout per step) phase-locks every
    env finishing on the same step onto ONE board — a training-diversity
    problem when episodes synchronize (all B envs resetting together see a
    single layout per generation). A K-board pool restores layout diversity
    at K resets per rollout instead of B per step (the measured 10.5x cost
    of fully independent resets — BASELINE.md row 3r). Callers rotate the
    assignment over time with ``rotate_fresh_batch``.
    """
    assert batch % n_pool == 0, (batch, n_pool)
    pool = jax.vmap(lambda k: reset(params, k))(
        jax.random.split(key, n_pool))
    return jax.tree.map(
        lambda x: jnp.tile(x, (batch // n_pool,) + (1,) * (x.ndim - 1)),
        pool)


def rotate_fresh_batch(fresh_b: EnvState, t):
    """Rotate the pool->env assignment by ``t`` (traced ok): env i sees
    layout (i + t) % n_pool, so an env resetting twice inside one rollout
    gets two different boards. A roll is two contiguous slices — no gather."""
    return jax.tree.map(lambda x: jnp.roll(x, t, axis=0), fresh_b)


def step_autoreset_with_fresh_batch(params: EnvParams, state: EnvState,
                                    actions, fresh_b: EnvState,
                                    env_offset=0, salt=0):
    """Pool-diversity autoreset: like ``step_autoreset_with_fresh`` but the
    caller provides a BATCHED fresh state (B, …) — env i that finishes
    restarts on ``fresh_b[i]`` (see ``fresh_pool_tiled``). ``salt`` (e.g.
    the rollout step index) is folded into the post-reset step keys so an
    env re-drawing the same pool layout at a later step still diverges.
    """
    stepped, rew, done = jax.vmap(
        lambda s, a: step(params, s, a))(state, actions)
    B = done.shape[0]

    def sel(a, b):
        return jnp.where(done.reshape((B,) + (1,) * (b.ndim - 1)), b, a)

    new_state = jax.tree.map(sel, stepped, fresh_b)
    env_keys = jax.vmap(rng.fold_in)(
        fresh_b.key, env_offset + jnp.arange(B))
    env_keys = jax.vmap(rng.fold_in, (0, None))(env_keys, salt)
    new_state.key = jnp.where(done[:, None], env_keys, stepped.key)
    info = {
        "episode_return": jnp.where(done, stepped.accum_reward.sum(-1), 0.0),
        "episode_length": jnp.where(done, stepped.step_count, 0),
        "episode_cycles": jnp.where(done, stepped.cycles.sum(-1), 0),
    }
    return new_state, rew, done, info


def stagger_step_counts(state: EnvState, max_steps: int):
    """Spread initial episode phases evenly over the batch: env i starts at
    step_count i*max_steps//B, so first episodes truncate at staggered
    lengths and completions stream instead of bursting in lockstep (the
    whole batch finishing — and resetting — on the same step every
    generation). Training-init only; parity paths never call this."""
    B = state.step_count.shape[0]
    state.step_count = (jnp.arange(B, dtype=jnp.int32)
                        * max_steps) // B
    return state


def _select_fresh(stepped: EnvState, rew, done, fresh: EnvState,
                  env_offset=0):
    B = done.shape[0]

    def sel(a, b):
        return jnp.where(done.reshape((B,) + (1,) * (b.ndim)), b[None], a)

    new_state = jax.tree.map(sel, stepped, fresh)
    # distinct per-env step keys so post-reset RNG streams diverge
    env_keys = jax.vmap(lambda i: rng.fold_in(fresh.key, i))(
        env_offset + jnp.arange(B))
    new_state.key = jnp.where(done[:, None], env_keys, stepped.key)
    info = {
        "episode_return": jnp.where(done, stepped.accum_reward.sum(-1), 0.0),
        "episode_length": jnp.where(done, stepped.step_count, 0),
        "episode_cycles": jnp.where(done, stepped.cycles.sum(-1), 0),
    }
    return new_state, rew, done, info
