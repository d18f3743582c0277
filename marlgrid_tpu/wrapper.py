"""Host-side gym-classic wrapper around the jitted engine.

Reproduces the reference's single-env API shape exactly
(``marlgrid/base.py — §MultiGridEnv``, SURVEY §3.3): ``reset() -> [obs]``,
``step(list_of_actions) -> (obs_list, reward_array, done_bool, info)``
(gym-classic 4-tuple with per-agent lists), plus ``render`` / ``encode`` /
seeding. Under the hood every call dispatches one jitted program; this class
exists for drop-in familiarity and for the oracle-parity harness — large-scale
training should use ``marlgrid_tpu.vector.VectorEnv`` (no host-Python in the
step path).
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import rendering
from .agents import GridAgentInterface, agents_to_params_fields
from .core import constants as C
from .core import grid_gen, obs as obs_mod, step as step_mod
from .core.state import EnvParams, EnvState, default_agent_colors, np_grid


@functools.lru_cache(maxsize=64)
def _compiled(params: EnvParams):
    """Jitted reset/step/obs closures, cached per static config."""
    if params.observation_style == "encode":
        luts = ()
    else:
        luts = (jnp.asarray(rendering.base_lut(params.view_tile_size)),
                jnp.asarray(rendering.agent_lut(params.view_tile_size)))

    reset_fn = jax.jit(lambda key: grid_gen.reset(params, key))
    step_fn = jax.jit(lambda s, a: step_mod.step(params, s, a))
    obs_fn = jax.jit(lambda s: obs_mod.all_agent_obs(params, s, *luts))

    def _visible_world(s):
        w, inb = obs_mod.all_view_world_coords(params, s)
        wx, wy = w[..., 0], w[..., 1]
        if params.see_through_walls:
            vis = jnp.ones_like(inb)
        else:
            vt, _, vst, _, _, _ = obs_mod.all_view_cells(params, s)
            vis = obs_mod.process_vis(obs_mod.transparency(vt, vst),
                                      params.view_size, params.view_offset)
        wx = jnp.clip(wx, 0, params.width - 1)
        wy = jnp.clip(wy, 0, params.height - 1)
        return wx, wy, inb & vis

    vis_fn = jax.jit(_visible_world)
    return reset_fn, step_fn, obs_fn, vis_fn


try:  # subclass gymnasium.Env so gymnasium.make()/wrappers accept us
    import gymnasium as _gymnasium

    _EnvBase = _gymnasium.Env
except ImportError:  # pragma: no cover
    _EnvBase = object


class MultiGridEnv(_EnvBase):
    """Reference-shaped multi-agent env (SURVEY §3.1 ctor surface).

    Registered ids also live in the real gymnasium registry
    (``gymnasium.make('MarlGrid-…-v0')`` works), but the API shape stays
    gym-classic like the reference: ``reset() -> [obs]``,
    ``step(actions) -> (obs_list, rew_array, done, info)`` — per-agent
    lists, single shared done (SURVEY §3.3)."""

    scenario: str = "empty"
    metadata = {"render_modes": ["rgb_array", "human"]}
    render_mode = None

    def __init__(self, agents: Optional[List[GridAgentInterface]] = None,
                 grid_size: Optional[int] = None, width: Optional[int] = None,
                 height: Optional[int] = None, max_steps: int = 100,
                 reward_decay: bool = True, seed: int = 0,
                 respawn: bool = False, ghost_mode: bool = True,
                 agent_spawn_kwargs: Optional[dict] = None,
                 params: Optional[EnvParams] = None, **scenario_kwargs):
        if params is None:
            if grid_size is not None:
                width = height = grid_size
            agents = agents or [GridAgentInterface()]
            fields = agents_to_params_fields(agents)
            if agent_spawn_kwargs:
                # reference forwards these into per-agent place_obj calls
                # (``MultiGridEnv(agent_spawn_kwargs)`` [M]); here top/size
                # become the static spawn rectangle on the in-graph reset
                sk = dict(agent_spawn_kwargs)
                fields["agent_spawn_top"] = tuple(sk.pop("top", (0, 0)))
                size = sk.pop("size", None)
                fields["agent_spawn_size"] = \
                    tuple(size) if size is not None else None
                assert not sk, f"unsupported agent_spawn_kwargs: {sk}"
            fields.update(width=width or 9, height=height or 9,
                          max_steps=max_steps, reward_decay=reward_decay,
                          respawn=respawn, ghost_mode=ghost_mode,
                          scenario=self.scenario, **scenario_kwargs)
            params = EnvParams(**fields)
        self.params = params
        self.agents = agents or [
            GridAgentInterface(color=C.COLOR_NAMES[ci])
            for ci in params.agent_colors
        ]
        self.num_agents = params.n_agents
        self._reset_fn, self._step_fn, self._obs_fn, self._vis_fn = \
            _compiled(params)
        # heterogeneous per-agent obs: one compiled group per distinct
        # (view_size, view_tile_size, observation_style) — SURVEY §2.1
        self._obs_groups = None
        if params.has_hetero_obs:
            groups = {}
            for i in range(params.n_agents):
                gp = params.agent_obs_params(i)
                groups.setdefault(gp, []).append(i)
            self._obs_groups = [(idxs, _compiled(gp)) for gp, idxs
                                in groups.items()]
        self.state: Optional[EnvState] = None
        self._viewer = None
        self.seed(seed)

    # ------------------------------------------------------------------ gym
    def seed(self, seed: int = 0):
        """gym-style seeding (``marlgrid/base.py — §seed`` analog)."""
        self._key = jax.random.PRNGKey(seed)
        self._episode = 0
        # host-side RNG for the interactive place_obj/place_agent helpers
        # (off the jitted path; the in-graph reset uses the SPEC §4 protocol)
        self.np_random = np.random.default_rng(seed)
        return [seed]

    @property
    def action_space(self):
        return [a.action_space for a in self.agents]

    @property
    def observation_space(self):
        return [a.observation_space for a in self.agents]

    def reset(self, seed: Optional[int] = None):
        if seed is not None:
            self.seed(seed)
        ep_key = jax.random.fold_in(self._key, self._episode)
        self._episode += 1
        self.state = self._reset_fn(ep_key)
        self._sync_agents()
        return self._host_obs()

    def step(self, actions: Sequence[int]):
        assert self.state is not None, "call reset() first"
        a = jnp.asarray(np.asarray(actions, np.int32))
        self.state, rew, done = self._step_fn(self.state, a)
        self._sync_agents()
        return (self._host_obs(), np.asarray(rew), bool(done), {})

    # ------------------------------------------------------------- obs/render
    def _host_obs(self):
        p = self.params
        if self._obs_groups is None:
            obs = np.asarray(self._obs_fn(self.state))
            per_agent = [obs[i] for i in range(p.n_agents)]
        else:
            per_agent = [None] * p.n_agents
            for idxs, fns in self._obs_groups:
                group_obs = np.asarray(fns[2](self.state))
                for i in idxs:
                    per_agent[i] = group_obs[i]
        if all(p.agent_obs_style(i) in ("image", "encode")
               for i in range(p.n_agents)):
            return per_agent
        rew = np.asarray(self.state.last_reward)
        pos = np.asarray(self.state.agent_pos)
        dirs = np.asarray(self.state.agent_dir)
        out = []
        for i in range(p.n_agents):
            if p.agent_obs_style(i) != "rich":
                out.append(per_agent[i])
                continue
            d = {"pov": per_agent[i]}
            if p.agent_observes_rewards(i):
                d["reward"] = float(rew[i])
            if p.agent_observes_position(i):
                d["position"] = tuple(int(v) for v in pos[i])
            if p.agent_observes_orientation(i):
                d["orientation"] = int(dirs[i])
            out.append(d)
        return out

    def _sync_agents(self):
        """Mirror device state into the GridAgentInterface objects."""
        pos = np.asarray(self.state.agent_pos)
        dirs = np.asarray(self.state.agent_dir)
        act = np.asarray(self.state.active)
        carry = np.asarray(self.state.carry_type)
        pres = np.asarray(self.state.prestige)
        for i, a in enumerate(self.agents):
            a.pos = tuple(int(v) for v in pos[i])
            a.dir = int(dirs[i])
            a.active = bool(act[i])
            a.carrying = int(carry[i])
            a.prestige = float(pres[i])

    def gen_agent_obs(self, agent):
        """One agent's current observation (``MultiGridEnv.gen_agent_obs``).

        ``agent`` is an index or one of ``self.agents``.
        """
        i = agent if isinstance(agent, int) else self.agents.index(agent)
        return self._host_obs()[i]

    def encode(self) -> np.ndarray:
        """(W, H, 3) symbolic board encode (``MultiGrid.encode``)."""
        return np_grid(self.state, self.params)

    def _free_cells_host(self, top, size, reject_fn):
        """(K, 2) int array of placeable cells under the reference's
        validity rule (empty cell, no agent, caller reject_fn)."""
        p = self.params
        enc = self.encode()
        x0, y0 = top
        x1 = p.width if size is None else min(x0 + size[0], p.width)
        y1 = p.height if size is None else min(y0 + size[1], p.height)
        pos = np.asarray(self.state.agent_pos)
        out = []
        for x in range(x0, x1):
            for y in range(y0, y1):
                if enc[x, y, 0] != C.EMPTY:
                    continue
                if ((pos[:, 0] == x) & (pos[:, 1] == y)).any():
                    continue
                if reject_fn is not None and reject_fn(self, (x, y)):
                    continue
                out.append((x, y))
        return out

    def _validate_raw_cell(self, cell):
        """Raw (type, color, state) triples get the same table-bounds
        checks ``encode_obj_cell`` applies to WorldObjs: a goal/bonus state
        outside the reward tables would silently pay 0.0 through the step
        engine's one-hot lookup (sum over an all-miss one-hot)."""
        t, _, s = (int(v) for v in cell)
        p = self.params
        if t == C.GOAL and p.goal_rewards and not 0 <= s < len(p.goal_rewards):
            raise ValueError(
                f"goal state {s} is outside EnvParams.goal_rewards "
                f"(len {len(p.goal_rewards)}); it would pay 0.0 reward")
        if t == C.BONUS:
            n = max(p.n_bonus_tiles, 1)
            if not 0 <= s < n:
                raise ValueError(
                    f"bonus_id {s} is outside n_bonus_tiles={p.n_bonus_tiles}")
            if p.bonus_rewards and s >= len(p.bonus_rewards):
                raise ValueError(
                    f"bonus_id {s} is outside EnvParams.bonus_rewards "
                    f"(len {len(p.bonus_rewards)}); it would pay 0.0 reward")

    def _set_cell_host(self, x, y, cell):
        flat = x * self.params.height + y
        t, c_, s = (int(v) for v in cell)
        self.state.grid_type = self.state.grid_type.at[flat].set(t)
        self.state.grid_color = self.state.grid_color.at[flat].set(c_)
        self.state.grid_state = self.state.grid_state.at[flat].set(s)

    def place_obj(self, obj, top=(0, 0), size=None, reject_fn=None,
                  max_tries=100):
        """Rejection-sample a free cell and place ``obj`` there
        (``MultiGridEnv.place_obj``, SURVEY §3.2). Host-side convenience for
        interactive use — mutates the CURRENT episode state via device
        updates; the in-graph reset path places through the SPEC §4 event
        chain instead. ``obj`` is a ``marlgrid_tpu.objects`` instance or a
        (type, color, state) triple. Returns the (x, y) chosen; None only
        when no free cell exists in the region at all. If ``max_tries``
        uniform draws all land on occupied cells, falls back to the first
        free cell in row-major order (matching SPEC §4)."""
        assert self.state is not None, "call reset() first"
        if hasattr(obj, "encode"):
            cell = grid_gen.encode_obj_cell(obj, self.params)
        else:
            cell = tuple(obj)
            self._validate_raw_cell(cell)
        free = self._free_cells_host(top, size, reject_fn)
        if not free:
            return None
        p = self.params
        free_set = set(free)
        # sample from the rectangle clamped to the board (same x1/y1 as
        # _free_cells_host) so a non-zero ``top`` keeps placement uniform
        # instead of wasting draws off-board (ADVICE r1)
        x0, y0 = top
        x1 = p.width if size is None else min(x0 + size[0], p.width)
        y1 = p.height if size is None else min(y0 + size[1], p.height)
        for _ in range(max_tries):
            x = int(self.np_random.integers(x0, x1))
            y = int(self.np_random.integers(y0, y1))
            if (x, y) in free_set:
                self._set_cell_host(x, y, cell)
                return (x, y)
        # SPEC §4 fallback: first free cell in row-major (y, then x) order
        x, y = min(free, key=lambda xy: (xy[1], xy[0]))
        self._set_cell_host(x, y, cell)
        return (x, y)

    def place_agent(self, i, top=(0, 0), size=None, reject_fn=None,
                    max_tries=100, dir=None, activate=True):
        """Re-place agent ``i`` at a free cell (``MultiGridEnv.place_agent``
        analog; host-side convenience like ``place_obj``).

        With ``activate=True`` (default) the agent is activated UNLESS it
        still has an unmet ``spawn_delay`` (SPEC §5.5b: a pending agent
        activates in-graph at the step whose pre-step count equals its
        delay; pre-activating here would skip that protocol). Re-activating
        an agent that finished (reached a goal / died) IS allowed — this is
        an interactive board edit that deliberately overrides §5.5b's
        "never re-activates" for authoring purposes; pass ``activate=False``
        to move the agent without touching its active flag."""
        assert self.state is not None, "call reset() first"
        free = self._free_cells_host(top, size, reject_fn)
        if not free:
            return None
        x, y = free[int(self.np_random.integers(0, len(free)))]
        self.state.agent_pos = self.state.agent_pos.at[i].set(
            jnp.asarray([x, y], jnp.int32))
        if dir is None:
            dir = int(self.np_random.integers(0, 4))
        self.state.agent_dir = self.state.agent_dir.at[i].set(dir)
        dl = self.params.spawn_delay_tuple()[i]
        if activate and not (dl > 0 and dl >= int(self.state.step_count)):
            self.state.active = self.state.active.at[i].set(True)
        self._sync_agents()
        return (x, y)

    def __str__(self):
        """ASCII board render (``WorldObj.str_render`` [M] / minigrid
        ``MultiGrid.__str__`` lineage): one 2-char code per cell, agents as
        ``<dir-arrow><color letter>`` (shown when active or not ghost_mode),
        rows are y (top to bottom), columns x."""
        p = self.params
        enc = self.encode()
        cell = [[C.str_render(*enc[x, y]) for x in range(p.width)]
                for y in range(p.height)]
        pos = np.asarray(self.state.agent_pos)
        dirs = np.asarray(self.state.agent_dir)
        act = np.asarray(self.state.active)
        for i in range(p.n_agents):
            if p.ghost_mode and not act[i]:
                continue
            x, y = int(pos[i, 0]), int(pos[i, 1])
            cell[y][x] = (C.AGENT_DIR_TO_STR[int(dirs[i])]
                          + C.COLOR_NAMES[p.agent_colors[i]][0].upper())
        return "\n".join("".join(row) for row in cell)

    def agent_highlight_mask(self) -> np.ndarray:
        """(W, H) bool union of all agents' visible cells (for render)."""
        p = self.params
        mask = np.zeros((p.width, p.height), bool)
        groups = self._obs_groups or [(range(p.n_agents),
                                       (None, None, None, self._vis_fn))]
        for idxs, fns in groups:
            wx, wy, vis = (np.asarray(v) for v in fns[3](self.state))
            for i in idxs:
                m = vis[i]
                mask[wx[i][m], wy[i][m]] = True
        return mask

    def render(self, mode=None, tile_size=16, highlight=True,
               show_agent_views=False, **_):
        """Full-board render (SURVEY §3.5). ``mode=None`` resolves to the
        gymnasium ``render_mode`` the env was made with (falling back to
        'rgb_array'), so ``gymnasium.make(id, render_mode='human')`` +
        ``env.render()`` honors the conventional contract. ``mode='human'``
        displays the frame through ``rendering.SimpleImageViewer``
        (``marlgrid/base.py — §render`` viewer [M]; PIL window when a
        display exists, /tmp PNG frames on headless TPU hosts) and returns
        the image as well. ``show_agent_views`` composites each agent's POV
        strip on the right (``marlgrid/base.py — §render`` [M])."""
        mode = mode or self.render_mode or "rgb_array"
        hm = self.agent_highlight_mask() if highlight else None
        img = rendering.render_board(self.params, self.state, tile_size,
                                     highlight_mask=hm)
        if show_agent_views:
            import jax.numpy as jnp

            p = self.params
            bl = jnp.asarray(rendering.base_lut(tile_size))
            al = jnp.asarray(rendering.agent_lut(tile_size))
            povs = np.asarray(obs_mod.all_obs_image(p, self.state, bl, al))
            side = povs.shape[1]
            pad = 2
            strip = np.zeros((img.shape[0],
                              side + 2 * pad, 3), np.uint8)
            for i in range(p.n_agents):
                y0 = i * (side + pad)
                if y0 + side > strip.shape[0]:
                    break
                strip[y0:y0 + side, pad:pad + side] = povs[i]
            img = np.concatenate([img, strip], axis=1)
        if mode == "human":
            if self._viewer is None:
                self._viewer = rendering.SimpleImageViewer()
            self._viewer.imshow(img)
        return img

    def close(self):
        if self._viewer is not None:
            self._viewer.close()
            self._viewer = None


def env_params_for(scenario: str, grid_size: int, n_agents: int,
                   **kw) -> EnvParams:
    """Convenience EnvParams builder with reference-style defaults."""
    kw.setdefault("agent_colors", default_agent_colors(n_agents))
    return EnvParams(width=grid_size, height=grid_size, n_agents=n_agents,
                     scenario=scenario, **kw)


class GymnasiumMultiGridEnv(MultiGridEnv):
    """Modern gymnasium 5-tuple API over the same engine (no reference
    analog — the reference predates the terminated/truncated split).

    ``reset(seed=, options=) -> (obs_tuple, info)``;
    ``step(actions) -> (obs_tuple, rewards, terminated, truncated, info)``
    with ``truncated`` = the step limit was hit and ``terminated`` = the
    episode genuinely ended (every agent inactive with no pending spawn,
    or a ``reset_on_cycle`` completion) — both can be true when they
    coincide on the final step. Observations/rewards stay per-agent
    tuples (multi-agent env)."""

    def reset(self, seed=None, options=None):
        obs = super().reset(seed=seed)
        return tuple(obs), {}

    def step(self, actions):
        import numpy as _np

        pre_cycles = int(_np.asarray(self.state.cycles).sum())
        obs, rew, done, info = super().step(actions)
        p = self.params
        truncated = bool(done) and \
            int(self.state.step_count) >= p.max_steps
        count = int(self.state.step_count)
        pending = any(d > 0 and d >= count
                      for d in p.spawn_delay_tuple())
        all_out = not bool(_np.asarray(self.state.active).any()) \
            and not pending
        cycled = p.reset_on_cycle and \
            int(_np.asarray(self.state.cycles).sum()) > pre_cycles
        terminated = bool(done) and (all_out or cycled)
        return tuple(obs), rew, terminated, truncated, info
