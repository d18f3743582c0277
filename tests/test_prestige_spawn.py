"""Prestige display + spawn_delay parity tests.

``GridAgentInterface(prestige_beta/prestige_scale)`` [M] — agent sprite color
dims with accumulated reward — and ``GridAgentInterface(spawn_delay)`` [L]
(SURVEY §2.1): engine vs oracle on both features, plus the batched image path
with nonzero prestige (SPEC §5/§8 semantics).
"""
import jax
import jax.numpy as jnp
import numpy as np

from marlgrid_tpu import rendering
from marlgrid_tpu.core import constants as C
from marlgrid_tpu.core import grid_gen, obs as obs_mod, step as step_mod
from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.oracle import OracleEnv


def test_prestige_dim_table():
    assert C.PRESTIGE_DIM[0] == 1.0
    assert all(np.diff(C.PRESTIGE_DIM) < 0), "dim factors must decrease"
    # device helper agrees with the host helper on both sides of a boundary
    p = EnvParams(prestige_scale=2.0)
    vals = jnp.asarray([0.0, 1.9, 2.1, 50.0])
    dev = np.asarray(obs_mod.prestige_dim(p, vals))
    host = [C.prestige_dim_factor(v, 2.0) for v in np.asarray(vals)]
    np.testing.assert_array_equal(dev, host)


def test_prestige_image_parity():
    """Bonus-tile rewards accumulate prestige; sprites dim identically in the
    engine LUT path and the oracle per-cell rasterizer."""
    params = EnvParams(width=11, height=11, n_agents=3, scenario="goal_cycle",
                       n_clutter=4, n_bonus_tiles=3, reward_decay=False,
                       view_size=7, view_tile_size=8, max_steps=40,
                       prestige_scale=0.5,  # small scale: few rewards dim
                       agent_colors=default_agent_colors(3),
                       observation_style="image")
    bl = jnp.asarray(rendering.base_lut(8))
    al = jnp.asarray(rendering.agent_lut(8))
    rng = np.random.default_rng(3)
    T = 30
    # forward-heavy actions so agents actually hit bonus tiles
    actions = rng.choice([0, 1, 2, 2, 2], size=(T, params.n_agents))

    # seed prestige so several dim levels are exercised deterministically
    # (levels 7, 2, 0 at scale 0.5), decaying across the trajectory
    p0 = np.asarray([4.0, 1.2, 0.3], np.float32)

    @jax.jit
    def run(key, actions):
        s0 = grid_gen.reset(params, key)
        s0.prestige = jnp.asarray(p0)

        def body(s, a):
            s2, _, _ = step_mod.step(params, s, a)
            return s2, (s2.prestige, obs_mod.all_agent_obs(params, s2, bl,
                                                           al))

        _, (pres, obss) = jax.lax.scan(body, s0, actions)
        return pres, obss

    key = jax.random.PRNGKey(11)
    pres, obss = jax.device_get(run(key, jnp.asarray(actions, jnp.int32)))

    oracle = OracleEnv(params)
    oracle.reset(key)
    oracle.prestige = p0.copy()
    levels_seen = set()
    for t in range(T):
        oracle.step(actions[t])
        np.testing.assert_allclose(pres[t], oracle.prestige, atol=1e-5,
                                   err_msg=f"prestige t={t}")
        for i in range(params.n_agents):
            levels_seen.add(int(oracle.prestige[i] / params.prestige_scale))
            np.testing.assert_array_equal(obss[t, i], oracle.obs_image(i),
                                          err_msg=f"img t={t} agent{i}")
    assert len(levels_seen) >= 3, f"want several dim levels, got {levels_seen}"


def test_prestige_batched_image_matches_vmap():
    """all_obs_image_b dims identically to vmap(all_obs_image) when agents
    carry distinct nonzero prestige."""
    params = EnvParams(width=9, height=9, n_agents=2, scenario="empty",
                       view_size=5, view_tile_size=4, prestige_scale=1.0,
                       agent_colors=default_agent_colors(2),
                       observation_style="image")
    bl = jnp.asarray(rendering.base_lut(4))
    al = jnp.asarray(rendering.agent_lut(4))
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    bstate = jax.vmap(lambda k: grid_gen.reset(params, k))(keys)
    bstate.prestige = jnp.asarray(
        np.random.default_rng(1).uniform(0, 8, (B, params.n_agents)),
        jnp.float32)
    ref = jax.vmap(lambda s: obs_mod.all_obs_image(params, s, bl, al))(bstate)
    got = obs_mod.all_obs_image_b(params, bstate, bl, al)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_spawn_delay_parity():
    """Full trajectory parity with staggered spawns, including the pending
    agents keep-alive in done (SPEC §5)."""
    params = EnvParams(width=9, height=9, n_agents=3, scenario="empty",
                       spawn_delays=(0, 2, 5), max_steps=20,
                       agent_colors=default_agent_colors(3),
                       observation_style="encode")
    rng = np.random.default_rng(5)
    T = 22
    actions = rng.integers(0, 7, (T, params.n_agents))

    @jax.jit
    def run(key, actions):
        s0 = grid_gen.reset(params, key)

        def body(s, a):
            s2, rew, done = step_mod.step(params, s, a)
            return s2, (s2.active, rew, done,
                        obs_mod.all_agent_obs(params, s2))

        _, out = jax.lax.scan(body, s0, actions)
        return s0.active, out

    key = jax.random.PRNGKey(2)
    act0, (acts, rews, dones, obss) = jax.device_get(
        run(key, jnp.asarray(actions, jnp.int32)))

    oracle = OracleEnv(params)
    oracle.reset(key)
    np.testing.assert_array_equal(act0, [True, False, False])
    np.testing.assert_array_equal(act0, oracle.active)
    for t in range(T):
        oobs, orew, odone, _ = oracle.step(actions[t])
        np.testing.assert_array_equal(acts[t], oracle.active,
                                      err_msg=f"active t={t}")
        np.testing.assert_allclose(rews[t], orew, atol=1e-5)
        assert bool(dones[t]) == odone, f"done t={t}"
        for i in range(params.n_agents):
            np.testing.assert_array_equal(obss[t, i], oobs[i],
                                          err_msg=f"obs t={t} agent{i}")
    # spawn timing: agent 1 becomes active on the step with pre-step count 2
    assert not acts[0][1] and not acts[1][1] and acts[2][1]
    assert not acts[3][2] and acts[5][2]


def test_spawn_delay_keeps_episode_alive():
    """All-delayed agents: the episode must not end before they spawn."""
    params = EnvParams(width=9, height=9, n_agents=1, scenario="empty",
                       spawn_delays=(3,), max_steps=10,
                       agent_colors=default_agent_colors(1),
                       observation_style="encode")
    s = grid_gen.reset(params, jax.random.PRNGKey(0))
    assert not bool(s.active[0])
    step = jax.jit(lambda s, a: step_mod.step(params, s, a))
    for t in range(4):
        s, _, done = step(s, jnp.zeros((1,), jnp.int32))
        # SPEC §5.5b: not-done through the spawn step — the agent activates
        # at the start of the step with pre-step count == 3 (t == 3), so the
        # episode must stay alive through t < 3 and the agent must be active
        # (having acted) before any done can fire.
        if t < 3:
            assert not bool(done), f"episode died before spawn at t={t}"
        if t >= 3:
            assert bool(s.active[0]), f"agent not active after spawn t={t}"
    assert bool(s.active[0])

    # the oracle must agree step-for-step (shared-bug regression guard)
    oracle = OracleEnv(params)
    oracle.reset(jax.random.PRNGKey(0))
    s2 = grid_gen.reset(params, jax.random.PRNGKey(0))
    for t in range(5):
        s2, _, done = step(s2, jnp.zeros((1,), jnp.int32))
        _, _, odone, _ = oracle.step(np.zeros(1, np.int32))
        assert bool(done) == bool(odone), f"done mismatch t={t}"


def test_wrapper_accepts_prestige_and_spawn_kwargs():
    from marlgrid_tpu.agents import GridAgentInterface
    from marlgrid_tpu.wrapper import MultiGridEnv

    ags = [GridAgentInterface(color="red", prestige_scale=1.5, spawn_delay=0,
                              observation_style="encode"),
           GridAgentInterface(color="blue", prestige_scale=1.5, spawn_delay=2,
                              observation_style="encode")]
    env = MultiGridEnv(agents=ags, grid_size=9, max_steps=12)
    assert env.params.spawn_delays == (0, 2)
    assert env.params.prestige_scale == 1.5
    env.reset(seed=0)
    assert env.agents[0].active and not env.agents[1].active
    for _ in range(3):
        env.step([2, 2])
    assert env.agents[1].active
    assert isinstance(env.agents[0].prestige, float)


def test_autoreset_clears_prestige_and_delayed_spawns():
    """step_autoreset: a finished env comes back with prestige zeroed and
    delayed agents inactive again (SPEC §9 fresh-state semantics)."""
    params = EnvParams(width=9, height=9, n_agents=2, scenario="empty",
                       spawn_delays=(0, 2), max_steps=3,
                       agent_colors=default_agent_colors(2),
                       observation_style="encode")
    s = grid_gen.reset(params, jax.random.PRNGKey(4))
    s.prestige = jnp.asarray([5.0, 5.0], jnp.float32)
    step = jax.jit(lambda s, a: step_mod.step_autoreset(params, s, a))
    a = jnp.zeros((2,), jnp.int32)
    done_seen = False
    for _ in range(params.max_steps):
        s, _, done, _ = step(s, a)
        if bool(done):
            done_seen = True
            np.testing.assert_array_equal(np.asarray(s.prestige), [0.0, 0.0])
            np.testing.assert_array_equal(np.asarray(s.active),
                                          [True, False])
            assert int(s.step_count) == 0
    assert done_seen
