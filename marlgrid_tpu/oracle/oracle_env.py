"""The vendored pure-Python oracle — executable ground truth for SPEC.md.

This class is written in the *reference's* style (mutable state, per-agent
Python loops, per-cell rendering — ``marlgrid/base.py — §MultiGridEnv``,
SURVEY §3) and is deliberately independent of the jitted engine: scalar loops
instead of masked vector ops, literal minigrid ``process_vis`` sweeps instead
of the row-vectorized recurrence, per-cell sprite rasterization instead of LUT
gathers. Only the RNG protocol (``core/rng.py`` — SPEC §4) is shared: the
oracle fetches each reset's / step's draw streams with ONE jitted bulk call
(``rng.all_reset_draws`` / ``rng.all_step_draws``), which produce bit-identical
values to the engine's in-graph per-event draws.

Parity tests (tests/test_parity.py) drive oracle and engine from the same seed
and assert bit-equal trajectories and observations (SURVEY §4 item 1).
"""
from __future__ import annotations

import functools

import numpy as np

from ..core import constants as C
from ..core import rng
from ..core.state import EnvParams


def _n_scenario_events(p: EnvParams) -> int:
    from ..core.grid_gen import n_scenario_events

    return n_scenario_events(p)


class OracleEnv:
    def __init__(self, params: EnvParams):
        import jax

        self.p = params
        p = params
        n_events = _n_scenario_events(p) + p.n_agents
        self._reset_draws = jax.jit(functools.partial(
            rng.reset_draws, n_events=n_events,
            max_tries=p.max_place_tries, x0=1, rw=p.width - 2, y0=1,
            rh=p.height - 2, width=p.width, height=p.height))
        self._step_draws = jax.jit(functools.partial(
            rng.step_draws, n_agents=p.n_agents,
            max_tries=p.max_place_tries, x0=1, rw=p.width - 2, y0=1,
            rh=p.height - 2, with_respawn=p.respawn))

    # ------------------------------------------------------------------ reset
    def reset(self, key):
        p = self.p
        draws = self._reset_draws(key)
        self.key = np.asarray(draws[0])
        self._exs, self._eys = np.asarray(draws[1]), np.asarray(draws[2])
        self._edirs = np.asarray(draws[3])
        self._split_x, self._door_y = int(draws[4]), int(draws[5])
        self._ev = 0  # next placement event number (SPEC §4 ordering)

        W, H, N = p.width, p.height, p.n_agents
        self.grid = np.zeros((W, H, 3), np.int32)  # (type, color, state)
        self.grid[0, :, 0] = self.grid[-1, :, 0] = C.WALL
        self.grid[:, 0, 0] = self.grid[:, -1, 0] = C.WALL
        grey = C.COLOR_TO_IDX["grey"]
        self.grid[..., 1] = np.where(self.grid[..., 0] == C.WALL, grey, 0)

        self.agent_pos = np.zeros((N, 2), np.int32)
        self.agent_dir = np.zeros(N, np.int32)
        self.carrying = np.zeros((N, 3), np.int32)
        self.active = np.zeros(N, bool)
        self.last_bonus = np.full(N, -1, np.int32)
        self.cycle_progress = np.zeros(N, np.int32)
        self.cycles = np.zeros(N, np.int32)
        self.prestige = np.zeros(N, np.float32)
        self.accum_reward = np.zeros(N, np.float64)
        self.last_reward = np.zeros(N, np.float64)
        self.step_count = 0

        agent_mask = self._gen_grid()
        from ..core.grid_gen import agent_spawn_region_mask

        region = agent_spawn_region_mask(p)
        if region is not None:
            agent_mask = region if agent_mask is None \
                else (agent_mask & region)
        for i in range(N):
            self._place_agent(i, agent_mask)
        return [self._obs(i) for i in range(N)]

    # ------------------------------------------------- scenario grid builders
    def _gen_grid(self):
        p = self.p
        green = C.COLOR_TO_IDX["green"]
        grey = C.COLOR_TO_IDX["grey"]
        if p.scenario == "empty":
            self._place_obj((C.GOAL, green, 0))
            return None
        if p.scenario == "cluttered":
            for _ in range(p.n_clutter):
                self._place_obj((C.WALL, grey, 0))
            self._place_obj((C.GOAL, green, 0))
            return None
        if p.scenario == "doorkey":
            split_x, door_y = self._split_x, self._door_y
            self._ev += 1  # event 0 is the wall/door split draw
            self.grid[split_x, 1:p.height - 1] = (C.WALL, grey, 0)
            yellow = C.COLOR_TO_IDX["yellow"]
            self.grid[split_x, door_y] = (C.DOOR, yellow, C.DOOR_LOCKED)
            xs = np.arange(p.width)[:, None] * np.ones((1, p.height), int)
            left, right = xs < split_x, xs > split_x
            self._place_obj((C.KEY, yellow, 0), left)
            self._place_obj((C.GOAL, green, 0), right)
            return left
        if p.scenario == "goal_cycle":
            for _ in range(p.n_clutter):
                self._place_obj((C.WALL, grey, 0))
            pink = C.COLOR_TO_IDX["pink"]
            for b in range(p.n_bonus_tiles):
                self._place_obj((C.BONUS, pink, b))
            return None
        from ..core.grid_gen import ORACLE_SCENARIOS

        if p.scenario in ORACLE_SCENARIOS:  # register_scenario custom hook
            return ORACLE_SCENARIOS[p.scenario](self)
        raise ValueError(p.scenario)

    # ----------------------------------------------------- placement protocol
    def _free(self, x, y, mask):
        if self.grid[x, y, 0] != C.EMPTY:
            return False
        if mask is not None and not mask[x, y]:
            return False
        for j in range(self.p.n_agents):
            # unplaced agents sit at (0,0), a wall cell — never a candidate
            if self.agent_pos[j, 0] == x and self.agent_pos[j, 1] == y:
                return False
        return True

    def _select_cell(self, xs, ys, mask):
        """SPEC §4 place event: first-valid of max_tries draws, else the
        first free cell in row-major (y, then x) order."""
        for t in range(self.p.max_place_tries):
            if self._free(int(xs[t]), int(ys[t]), mask):
                return int(xs[t]), int(ys[t])
        for y in range(self.p.height):
            for x in range(self.p.width):
                if self._free(x, y, mask):
                    return x, y
        return None

    def _place_obj(self, cell, mask=None):
        if hasattr(cell, "encode"):   # accept marlgrid_tpu.objects instances
            from ..core.grid_gen import encode_obj_cell

            cell = encode_obj_cell(cell, self.p)
        e = self._ev
        self._ev += 1
        at = self._select_cell(self._exs[e], self._eys[e], mask)
        if at is not None:
            self.grid[at[0], at[1]] = cell

    def _place_agent(self, i, mask=None):
        e = self._ev
        self._ev += 1
        at = self._select_cell(self._exs[e], self._eys[e], mask)
        if at is None:
            at = (1, 1)
        self.agent_pos[i] = at
        self.agent_dir[i] = int(self._edirs[e])
        # delayed agents (spawn_delay [L], SPEC §5) start inactive
        self.active[i] = self.p.spawn_delay_tuple()[i] == 0

    # ------------------------------------------------------------------- step
    def step(self, actions):
        """SPEC §5 — literal sequential per-agent loop (SURVEY §3.3)."""
        p = self.p
        N = p.n_agents
        delays = p.spawn_delay_tuple()
        for i in range(N):  # delayed spawns activate pre-step (SPEC §5)
            if delays[i] > 0 and self.step_count == delays[i]:
                self.active[i] = True
        draws = self._step_draws(self.key)
        self.key = np.asarray(draws[0])
        perm = np.asarray(draws[1])
        pre_cycles = self.cycles.copy()
        self._respawn_draws = tuple(np.asarray(d) for d in draws[2:]) \
            if p.respawn else None
        rew = np.zeros(N, np.float64)

        for i in perm:
            i = int(i)
            if not self.active[i]:
                continue
            a = int(actions[i])
            if a == C.LEFT:
                self.agent_dir[i] = (self.agent_dir[i] - 1) % 4
            elif a == C.RIGHT:
                self.agent_dir[i] = (self.agent_dir[i] + 1) % 4
            elif a == C.FORWARD:
                rew[i] += self._forward(i)
            elif a == C.PICKUP:
                self._pickup(i)
            elif a == C.DROP:
                self._drop(i)
            elif a == C.TOGGLE:
                self._toggle(i)
            # C.DONE: no-op

        self.step_count += 1
        if p.reward_decay:
            rew *= 1.0 - 0.9 * self.step_count / p.max_steps
        self.accum_reward += rew
        self.last_reward = rew
        # prestige display accumulator (SPEC §8) — float32, engine recipe
        self.prestige = (self.prestige
                         * np.asarray(p.prestige_beta_tuple(), np.float32)
                         + np.maximum(rew, 0).astype(np.float32)
                         ).astype(np.float32)
        # post-increment count: an agent with d == step_count activates at
        # the start of the NEXT step, so it still counts as pending (§5.5b)
        pending = any(d > 0 and d >= self.step_count for d in delays)
        done = (self.step_count >= p.max_steps) \
            or (not self.active.any() and not pending)
        if p.reset_on_cycle and (self.cycles > pre_cycles).any():
            done = True
        obs = [self._obs(i) for i in range(N)]
        return obs, rew.astype(np.float32), bool(done), {}

    def _front(self, i):
        f = self.agent_pos[i] + C.DIR_VEC[self.agent_dir[i]]
        return int(f[0]), int(f[1])

    def _agent_at(self, x, y, exclude, blocking_only):
        for j in range(self.p.n_agents):
            if j == exclude:
                continue
            if self.agent_pos[j, 0] == x and self.agent_pos[j, 1] == y:
                if not blocking_only:
                    return True
                if self.active[j] or not self.p.ghost_mode:
                    return True
        return False

    def _forward(self, i):
        p = self.p
        fx, fy = self._front(i)
        ft, fc, fs = self.grid[fx, fy]
        if not C.can_overlap(int(ft), int(fs)):
            return 0.0
        if self._agent_at(fx, fy, i, blocking_only=True):
            return 0.0
        self.agent_pos[i] = (fx, fy)
        r = 0.0
        if ft == C.GOAL:
            # per-object reward: goal state indexes the table when set
            r += (p.goal_rewards[int(fs)] if p.goal_rewards
                  else p.goal_reward)
            if p.respawn:
                rxs, rys, rdirs = self._respawn_draws
                at = self._select_cell(rxs[i], rys[i], None)
                if at is not None:
                    self.agent_pos[i] = at
                    self.agent_dir[i] = int(rdirs[i])
            else:
                self.active[i] = False
        elif ft == C.LAVA:
            r += p.lava_penalty
            self.active[i] = False
        elif ft == C.BONUS:
            b, lb = int(fs), int(self.last_bonus[i])
            b_rew = p.bonus_rewards[b] if p.bonus_rewards else p.bonus_reward
            b_pen = (p.bonus_penalties[b] if p.bonus_penalties
                     else p.bonus_penalty)
            if lb < 0 or b == (lb + 1) % max(p.n_bonus_tiles, 1):
                r += b_rew
                self.last_bonus[i] = b
                self.cycle_progress[i] += 1
            elif b == lb:
                pass
            else:
                r -= b_pen
                self.last_bonus[i] = b
                self.cycle_progress[i] = 1   # chain restarts at this tile
            if self.cycle_progress[i] >= p.n_bonus_tiles:
                self.cycle_progress[i] = 0
                self.cycles[i] += 1
        return r

    def _pickup(self, i):
        fx, fy = self._front(i)
        ft = int(self.grid[fx, fy, 0])
        if C.can_pickup(ft) and self.carrying[i, 0] == C.EMPTY:
            self.carrying[i] = self.grid[fx, fy]
            self.grid[fx, fy] = 0

    def _drop(self, i):
        fx, fy = self._front(i)
        if (self.carrying[i, 0] != C.EMPTY
                and self.grid[fx, fy, 0] == C.EMPTY
                and not self._agent_at(fx, fy, i, blocking_only=False)):
            self.grid[fx, fy] = self.carrying[i]
            self.carrying[i] = 0

    def _toggle(self, i):
        fx, fy = self._front(i)
        ft, fc, fs = (int(v) for v in self.grid[fx, fy])
        if ft == C.DOOR:
            if fs == C.DOOR_LOCKED:
                if (self.carrying[i, 0] == C.KEY
                        and self.carrying[i, 1] == fc):
                    self.grid[fx, fy, 2] = C.DOOR_OPEN
            elif fs == C.DOOR_CLOSED:
                self.grid[fx, fy, 2] = C.DOOR_OPEN
            else:
                self.grid[fx, fy, 2] = C.DOOR_CLOSED
        elif ft == C.BOX:
            ct, cc = C.box_unpack(fs)
            self.grid[fx, fy] = (ct, cc, 0)

    # ----------------------------------------------------------- observations
    def _vs(self, i):
        """Agent i's view size (heterogeneous configs — SURVEY §2.1)."""
        return self.p.agent_view_size(i)

    def view_cell(self, i, vi, vj):
        """World cell shown at view coord (vi, vj) — SPEC §7 geometry,
        computed per cell with the up/right basis (independent of the
        engine's precomputed offset tables)."""
        p = self.p
        vs = self._vs(i)
        c, aj = vs // 2, vs - 1 - p.agent_view_offset(i)
        d = int(self.agent_dir[i])
        up, right = C.DIR_VEC[d], C.DIR_VEC[(d + 1) % 4]
        w = self.agent_pos[i] + (aj - vj) * up + (vi - c) * right
        return int(w[0]), int(w[1])

    def view_grid(self, i):
        """(vs, vs, 3) symbolic view + per-cell agent overlay info."""
        p = self.p
        vs = self._vs(i)
        grey = C.COLOR_TO_IDX["grey"]
        cells = np.zeros((vs, vs, 3), np.int32)
        agent = np.full((vs, vs), -1, np.int32)  # observed agent index
        for vi in range(vs):
            for vj in range(vs):
                x, y = self.view_cell(i, vi, vj)
                if 0 <= x < p.width and 0 <= y < p.height:
                    cells[vi, vj] = self.grid[x, y]
                    for j in range(p.n_agents):
                        if (self.agent_pos[j, 0] == x
                                and self.agent_pos[j, 1] == y
                                and (self.active[j] or not p.ghost_mode)):
                            agent[vi, vj] = j
                            break
                else:
                    cells[vi, vj] = (C.WALL, grey, 0)
        return cells, agent

    def process_vis(self, transparent, view_offset=None):
        """Literal minigrid occlusion sweep (SPEC §7, SURVEY §3.4 [H])."""
        p = self.p
        if view_offset is None:
            view_offset = p.view_offset
        vs = transparent.shape[0]
        mask = np.zeros((vs, vs), bool)
        mask[vs // 2, vs - 1 - view_offset] = True
        for j in range(vs - 1, -1, -1):
            for i_ in range(vs - 1):
                if mask[i_, j] and transparent[i_, j]:
                    mask[i_ + 1, j] = True
                    if j > 0:
                        mask[i_ + 1, j - 1] = True
                        mask[i_, j - 1] = True
            for i_ in range(vs - 1, 0, -1):
                if mask[i_, j] and transparent[i_, j]:
                    mask[i_ - 1, j] = True
                    if j > 0:
                        mask[i_ - 1, j - 1] = True
                        mask[i_, j - 1] = True
        return mask

    def vis_mask(self, i):
        cells, _ = self.view_grid(i)
        vs = self._vs(i)
        if self.p.agent_sees_through_walls(i):
            return np.ones((vs,) * 2, bool)
        transparent = np.array(
            [[C.see_behind(int(cells[vi, vj, 0]), int(cells[vi, vj, 2]))
              for vj in range(vs)]
             for vi in range(vs)])
        return self.process_vis(transparent, self.p.agent_view_offset(i))

    def obs_encode(self, i):
        """SPEC §7 'encode' style: (vs, vs, 3) int32."""
        p = self.p
        cells, agent = self.view_grid(i)
        out = cells.copy()
        for t in p.agent_hidden_types(i):     # visual-only (SPEC)
            out[out[..., 0] == t] = 0
        d = int(self.agent_dir[i])
        for vi in range(self._vs(i)):
            for vj in range(self._vs(i)):
                j = agent[vi, vj]
                if j >= 0:
                    out[vi, vj] = (C.AGENT, p.agent_colors[j],
                                   (self.agent_dir[j] - d + 3) % 4)
        vis = self.vis_mask(i)
        out[~vis] = 0
        return out

    def obs_image(self, i):
        """SPEC §7 'image' style, rendered per cell with the rasterizer
        directly (independent of the engine's LUT-gather path)."""
        from .. import rendering as R
        p = self.p
        vs, T = self._vs(i), p.agent_view_tile_size(i)
        cells, agent = self.view_grid(i)
        vis = self.vis_mask(i)
        d = int(self.agent_dir[i])
        img = np.zeros((vs * T, vs * T, 3), np.uint8)
        for vi in range(vs):
            for vj in range(vs):
                if not vis[vi, vj]:
                    continue
                t, c, s = (int(v) for v in cells[vi, vj])
                if t in p.agent_hidden_types(i):  # visual-only (SPEC)
                    t, c, s = 0, 0, 0
                s_vis = min(s, 2) if t == C.DOOR else 0
                tile = R.render_base_tile(t, c, s_vis, T)
                j = agent[vi, vj]
                if j >= 0:
                    over = R.render_agent_tile(
                        p.agent_colors[j],
                        (int(self.agent_dir[j]) - d + 3) % 4, T)
                    # prestige dimming (SPEC §8) — engine recipe: scale the
                    # full-bright sprite RGB by the quantized factor, truncate
                    f = C.prestige_dim_factor(
                        self.prestige[j], p.prestige_scale_tuple()[j])
                    rgb = (over[..., :3].astype(np.float32)
                           * f).astype(np.uint8)
                    tile = np.where(over[..., 3:] > 0, rgb, tile)
                img[vj * T:(vj + 1) * T, vi * T:(vi + 1) * T] = tile
        return img

    def _obs(self, i):
        p = self.p
        style = p.agent_obs_style(i)
        if style == "encode":
            return self.obs_encode(i)
        img = self.obs_image(i)
        if style == "image":
            return img
        out = {"pov": img}
        if p.agent_observes_rewards(i):
            out["reward"] = float(self.last_reward[i])
        if p.agent_observes_position(i):
            out["position"] = tuple(int(v) for v in self.agent_pos[i])
        if p.agent_observes_orientation(i):
            out["orientation"] = int(self.agent_dir[i])
        return out
