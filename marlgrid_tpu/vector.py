"""The TPU-native batched env API — the framework's first-class interface.

No reference analog (the reference is a single Python env instance,
SURVEY §2.3): this is the north-star layer where thousands of env instances
step in lockstep as one jitted, vmapped program, optionally sharded over a
``jax.sharding.Mesh`` so env shards live on their own chips/hosts
(embarrassingly parallel — no cross-env collectives; SURVEY §5).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from . import rendering
from .core import grid_gen, obs as obs_mod, step as step_mod
from .core.state import EnvParams


def obs_groups(params: EnvParams):
    """Group agents by their per-agent obs config: ``[(idxs, gp), …]``
    where ``idxs`` are the agent indices sharing homogeneous params ``gp``
    (one compiled obs program per group — SURVEY §2.1
    ``GridAgentInterface``). Used by VectorEnv, the host wrapper, and the
    hetero PPO learner (parallel/ppo_hetero.py)."""
    groups = {}
    order = []
    for i in range(params.n_agents):
        gp = params.agent_obs_params(i)
        if gp not in groups:
            groups[gp] = []
            order.append(gp)
        groups[gp].append(i)
    return [(tuple(groups[gp]), gp) for gp in order]


class VectorEnv:
    """Functional batched env: state in, state out; everything jitted.

    Usage::

        env = VectorEnv(params, n_envs=4096)
        state, obs = env.reset(jax.random.PRNGKey(0))
        state, obs, rew, done, info = env.step(state, actions)  # actions (B, N)
    """

    def __init__(self, params: EnvParams, n_envs: int,
                 sharding: Optional[jax.sharding.NamedSharding] = None,
                 auto_reset: bool = True, independent_resets: bool = False):
        self.params = params
        self.n_envs = n_envs
        self.auto_reset = auto_reset
        self.sharding = sharding

        # heterogeneous per-agent obs configs: one BATCHED obs program per
        # distinct config group (same grouping as the host wrapper —
        # SURVEY §2.1 GridAgentInterface); obs become a dict
        # {group_index: (B, n_group_agents, …)} and ``self.obs_groups``
        # lists each group's agent indices + homogeneous params. Each
        # group's program renders all N agents under the group's config and
        # keeps the group columns (agents must still see every OTHER agent
        # in their views, so the per-group compute is full-N by design).
        self.obs_groups = obs_groups(params) if params.has_hetero_obs \
            else None

        def _luts(p):
            if p.observation_style == "encode":
                return ()
            return (jnp.asarray(rendering.base_lut(p.view_tile_size)),
                    jnp.asarray(rendering.agent_lut(p.view_tile_size)))

        def _one(p, state):
            """One homogeneous-config batched obs: array, or the 'rich'
            dict (pov + the observe_* fields as batched arrays —
            ``GridAgentInterface(observation_style='rich')``, SURVEY §2.1;
            the reference returns per-agent dicts, here each field is
            (B, N, …))."""
            if p.observation_style != "rich":
                return obs_mod.all_agent_obs_b(p, state, *_luts(p))
            pi = p.replace(observation_style="image")
            d = {"pov": obs_mod.all_agent_obs_b(pi, state, *_luts(pi))}
            if p.observe_rewards:
                d["reward"] = state.last_reward
            if p.observe_position:
                d["position"] = state.agent_pos
            if p.observe_orientation:
                d["orientation"] = state.agent_dir
            return d

        def _obs(state):
            if self.obs_groups is None:
                return _one(params, state)
            # encode groups render ONLY their own observers against one
            # shared painted board (obs.all_obs_encode_b observers=…) —
            # total contraction work equals one full-N render; image/rich
            # groups keep the full-N render + column slice (the sprite
            # kernel's layout is full-population).
            shared_packed = (
                obs_mod.pack_grid_with_agents(params, state)
                if any(gp.observation_style == "encode"
                       for _, gp in self.obs_groups) else None)
            out = {}
            for g, (idxs, gp) in enumerate(self.obs_groups):
                if gp.observation_style == "encode":
                    out[g] = obs_mod.all_obs_encode_b(
                        gp, state, observers=idxs, packed=shared_packed)
                else:
                    out[g] = jax.tree.map(
                        lambda x: x[:, jnp.asarray(idxs)], _one(gp, state))
            return out

        def _reset(key):
            keys = jax.random.split(key, n_envs)
            if sharding is not None:
                keys = jax.lax.with_sharding_constraint(keys, sharding)
            state = jax.vmap(lambda k: grid_gen.reset(params, k))(keys)
            return state, _obs(state)

        def _step(state, actions):
            if auto_reset and independent_resets:
                # per-env fresh boards (step_autoreset): every env that
                # finishes gets its OWN board, at the cost of generating B
                # resets per step of which only ~B/max_steps are used. The
                # default shared-board variant generates one fresh board per
                # step and gives it to every env finishing that step
                # (documented tradeoff — see step_autoreset_batch; bench.py
                # --independent-resets quantifies the gap).
                state, rew, done, info = jax.vmap(
                    lambda s, a: step_mod.step_autoreset(params, s, a)
                )(state, actions)
            elif auto_reset:
                state, rew, done, info = step_mod.step_autoreset_batch(
                    params, state, actions)
            else:
                state, rew, done = jax.vmap(
                    lambda s, a: step_mod.step(params, s, a))(state, actions)
                info = {}
            return state, _obs(state), rew, done, info

        self.reset = jax.jit(_reset)
        self.step = jax.jit(_step)
        self._obs_fn = _obs

    @functools.cached_property
    def example_actions(self):
        return jnp.zeros((self.n_envs, self.params.n_agents), jnp.int32)

    def rollout_fn(self, policy_apply, rollout_len: int):
        """Build a jitted device-resident rollout: ``lax.scan`` over steps
        (SURVEY §2.3 'async actor/learner' row — fixed-length scan rollouts).

        ``policy_apply(params_pytree, obs, key) -> actions (B, N)``.
        Returns ``fn(policy_params, state, key) -> (state, trajectory)`` where
        trajectory is a pytree with leading axis ``rollout_len``.
        """
        def body(carry, _):
            state, key = carry
            key, ak = jax.random.split(key)
            obs = self._obs_fn(state)
            actions = policy_apply(None, obs, ak)
            state, obs2, rew, done, info = self.step(state, actions)
            return (state, key), dict(obs=obs, actions=actions, rew=rew,
                                      done=done)

        def fn(policy_params, state, key):
            (state, _), traj = jax.lax.scan(body, (state, key), None,
                                            length=rollout_len)
            return state, traj

        return jax.jit(fn)
