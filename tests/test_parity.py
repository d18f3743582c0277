"""Oracle-parity tests (SURVEY §4 item 1) — the correctness gate.

Drive the jitted engine and the pure-Python oracle from the same seed through
full episodes of random actions on the BASELINE.json config ladder and assert
bit-equal transitions, rewards, done flags, and observations (SPEC.md is the
contract; BASELINE.md "bit-exact trajectory parity" row).

The engine runs the whole trajectory device-side under ``lax.scan`` and the
comparison fetches it in ONE bulk transfer — this host's virtualization has
multi-ms scheduling jitter, so per-step host round-trips are both slow and
exactly what the TPU-native design avoids anyway.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlgrid_tpu.core import grid_gen, obs as obs_mod, step as step_mod
from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.oracle import OracleEnv

LADDER = [
    # BASELINE.json configs 1-4 (config 5 adds the learner; see test_ppo)
    pytest.param(EnvParams(width=9, height=9, n_agents=1, scenario="empty",
                           view_size=5, max_steps=30,
                           agent_colors=default_agent_colors(1),
                           observation_style="encode"), id="empty-9x9-1ag"),
    pytest.param(EnvParams(width=15, height=15, n_agents=3, scenario="empty",
                           view_size=7, max_steps=40,
                           agent_colors=default_agent_colors(3),
                           observation_style="encode"), id="empty-15x15-3ag"),
    pytest.param(EnvParams(width=15, height=15, n_agents=3,
                           scenario="cluttered", n_clutter=25, max_steps=40,
                           agent_colors=default_agent_colors(3),
                           observation_style="encode"),
                 id="cluttered-15x15-3ag"),
    pytest.param(EnvParams(width=11, height=11, n_agents=2,
                           scenario="doorkey", max_steps=40,
                           agent_colors=default_agent_colors(2),
                           observation_style="encode"), id="doorkey-11x11-2ag"),
    pytest.param(EnvParams(width=13, height=13, n_agents=4,
                           scenario="goal_cycle", n_clutter=10,
                           n_bonus_tiles=3, reward_decay=False, max_steps=40,
                           agent_colors=default_agent_colors(4),
                           observation_style="encode"),
                 id="goalcycle-13x13-4ag"),
    pytest.param(EnvParams(width=11, height=11, n_agents=2, scenario="empty",
                           respawn=True, max_steps=40,
                           agent_colors=default_agent_colors(2),
                           observation_style="encode"), id="empty-respawn"),
    pytest.param(EnvParams(width=11, height=11, n_agents=3, scenario="empty",
                           ghost_mode=False, max_steps=30,
                           agent_colors=default_agent_colors(3),
                           observation_style="encode"), id="empty-noghost"),
]

STATE_FIELDS = [
    # engine stores board layers flat (see EnvState docstring)
    ("grid_type", lambda o: o.grid[..., 0].reshape(-1)),
    ("grid_color", lambda o: o.grid[..., 1].reshape(-1)),
    ("grid_state", lambda o: o.grid[..., 2].reshape(-1)),
    ("agent_pos", lambda o: o.agent_pos),
    ("agent_dir", lambda o: o.agent_dir),
    ("active", lambda o: o.active),
    ("carry_type", lambda o: o.carrying[:, 0]),
    ("carry_color", lambda o: o.carrying[:, 1]),
    ("last_bonus", lambda o: o.last_bonus),
]


def engine_trajectory(params, key, actions):
    """Full-episode engine run: one jitted scan, one bulk device fetch."""
    @jax.jit
    def run(key, actions):
        s0 = grid_gen.reset(params, key)
        obs0 = obs_mod.all_agent_obs(params, s0)

        def body(s, a):
            s2, rew, done = step_mod.step(params, s, a)
            obs = obs_mod.all_agent_obs(params, s2)
            return s2, (s2, rew, done, obs)

        _, (states, rews, dones, obss) = jax.lax.scan(body, s0, actions)
        return s0, obs0, states, rews, dones, obss

    return jax.device_get(run(key, jnp.asarray(actions, jnp.int32)))


@pytest.mark.parametrize("params", LADDER)
def test_trajectory_parity(params):
    rng = np.random.default_rng(123)
    T = params.max_steps + 2  # deliberately steps past done (SPEC §5 holds)
    for seed in [0, 1]:
        key = jax.random.PRNGKey(seed)
        actions = rng.integers(0, 7, (T, params.n_agents))
        s0, obs0, states, rews, dones, obss = engine_trajectory(
            params, key, actions)

        oracle = OracleEnv(params)
        oobs = oracle.reset(key)
        for name, get in STATE_FIELDS:
            np.testing.assert_array_equal(getattr(s0, name), get(oracle),
                                          err_msg=f"{name} @reset")
        for i in range(params.n_agents):
            np.testing.assert_array_equal(obs0[i], oobs[i],
                                          err_msg=f"obs reset agent{i}")
        for t in range(T):
            oobs, orew, odone, _ = oracle.step(actions[t])
            for name, get in STATE_FIELDS:
                np.testing.assert_array_equal(
                    jax.tree.map(lambda x: x[t], getattr(states, name)),
                    get(oracle), err_msg=f"{name} @t={t}")
            np.testing.assert_allclose(rews[t], orew, atol=1e-5,
                                       err_msg=f"rew @t={t}")
            assert bool(dones[t]) == odone, f"done @t={t}"
            for i in range(params.n_agents):
                np.testing.assert_array_equal(obss[t, i], oobs[i],
                                              err_msg=f"obs t={t} agent{i}")


def test_image_obs_parity():
    """LUT-gather image path vs oracle per-cell rasterization (SURVEY §4.4)."""
    params = EnvParams(width=11, height=11, n_agents=2, scenario="doorkey",
                       view_size=7, view_tile_size=8, max_steps=20,
                       agent_colors=default_agent_colors(2),
                       observation_style="image")
    from marlgrid_tpu import rendering

    bl = jnp.asarray(rendering.base_lut(8))
    al = jnp.asarray(rendering.agent_lut(8))
    rng = np.random.default_rng(0)
    T = 10
    actions = rng.integers(0, 7, (T, params.n_agents))

    @jax.jit
    def run(key, actions):
        s0 = grid_gen.reset(params, key)

        def body(s, a):
            s2, _, _ = step_mod.step(params, s, a)
            return s2, obs_mod.all_agent_obs(params, s2, bl, al)

        _, obss = jax.lax.scan(body, s0, actions)
        return obs_mod.all_agent_obs(params, s0, bl, al), obss

    key = jax.random.PRNGKey(7)
    obs0, obss = jax.device_get(run(key, jnp.asarray(actions, jnp.int32)))

    oracle = OracleEnv(params)
    oracle.reset(key)
    for i in range(params.n_agents):
        np.testing.assert_array_equal(obs0[i], oracle.obs_image(i),
                                      err_msg=f"img reset agent{i}")
    for t in range(T):
        oracle.step(actions[t])
        for i in range(params.n_agents):
            np.testing.assert_array_equal(obss[t, i], oracle.obs_image(i),
                                          err_msg=f"img t={t} agent{i}")
