"""Heterogeneous per-agent observation configs (SURVEY §2.1: the reference
builds one GridAgentInterface per agent with independent view_size /
observation_style). The wrapper compiles one obs program per distinct config
group; every agent's obs must match the oracle rendered with that agent's
own config."""
import numpy as np
import pytest

import marlgrid_tpu  # noqa: F401
from marlgrid_tpu.agents import GridAgentInterface
from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.oracle import OracleEnv
from marlgrid_tpu.wrapper import MultiGridEnv


def test_hetero_view_sizes_parity():
    agents = [GridAgentInterface(color="red", view_size=5,
                                 observation_style="encode"),
              GridAgentInterface(color="blue", view_size=7,
                                 observation_style="encode"),
              GridAgentInterface(color="purple", view_size=7,
                                 observation_style="encode")]
    env = MultiGridEnv(agents=agents, grid_size=11, max_steps=30, seed=0)
    assert env.params.agent_view_sizes == (5, 7, 7)
    assert len(env._obs_groups) == 2

    import jax

    oracle = OracleEnv(env.params)
    ep_key = jax.random.fold_in(env._key, env._episode)
    obs = env.reset()
    oobs = oracle.reset(ep_key)
    assert obs[0].shape == (5, 5, 3) and obs[1].shape == (7, 7, 3)
    for i in range(3):
        np.testing.assert_array_equal(obs[i], oobs[i])
    rng = np.random.default_rng(4)
    for t in range(25):
        acts = rng.integers(0, 7, 3)
        obs, rew, done, _ = env.step(acts)
        oobs, orew, odone, _ = oracle.step(acts)
        np.testing.assert_allclose(rew, orew, atol=1e-5)
        assert bool(done) == odone
        for i in range(3):
            np.testing.assert_array_equal(obs[i], oobs[i],
                                          err_msg=f"t={t} agent={i}")
        if done:
            break


def test_hetero_styles_and_tile_sizes():
    agents = [GridAgentInterface(color="red", view_size=5,
                                 observation_style="image",
                                 view_tile_size=4),
              GridAgentInterface(color="blue", view_size=5,
                                 observation_style="encode")]
    env = MultiGridEnv(agents=agents, grid_size=9, max_steps=10, seed=1)
    obs = env.reset()
    assert obs[0].shape == (20, 20, 3) and obs[0].dtype == np.uint8
    assert obs[1].shape == (5, 5, 3)
    sp = env.observation_space
    assert sp[0].shape == (20, 20, 3) and sp[1].shape == (5, 5, 3)

    import jax

    oracle = OracleEnv(env.params)
    oracle.reset(jax.random.fold_in(env._key, 0))
    oobs = [oracle._obs(i) for i in range(2)]
    np.testing.assert_array_equal(obs[0], oobs[0])
    np.testing.assert_array_equal(obs[1], oobs[1])
    img = env.render(tile_size=8)   # highlight union across groups
    assert img.shape == (72, 72, 3)


def test_vector_env_hetero_groups_parity():
    """Hetero views on the BATCHED path (VERDICT r2 item 5): VectorEnv
    returns per-group obs pytrees; each agent column must equal the
    homogeneous batched program run under that agent's own config."""
    import jax
    import jax.numpy as jnp

    from marlgrid_tpu.core import obs as obs_mod
    from marlgrid_tpu.vector import VectorEnv

    params = EnvParams(width=11, height=11, n_agents=3, scenario="cluttered",
                       n_clutter=6, max_steps=20,
                       agent_view_sizes=(5, 7, 5),
                       agent_colors=default_agent_colors(3),
                       observation_style="encode")
    B = 4
    env = VectorEnv(params, n_envs=B)
    assert [idxs for idxs, _ in env.obs_groups] == [(0, 2), (1,)]
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert set(obs) == {0, 1}
    assert obs[0].shape == (B, 2, 5, 5, 3)
    assert obs[1].shape == (B, 1, 7, 7, 3)
    rng = np.random.default_rng(0)
    for t in range(8):
        acts = jnp.asarray(rng.integers(0, 7, (B, 3)))
        state, obs, rew, done, info = env.step(state, acts)
    for g, (idxs, gp) in enumerate(env.obs_groups):
        full = obs_mod.all_agent_obs_b(gp, state)      # (B, N, vs, vs, 3)
        np.testing.assert_array_equal(np.asarray(obs[g]),
                                      np.asarray(full[:, list(idxs)]))


def test_vector_env_hetero_trains_per_group_torsos():
    """PPO-style smoke at batch scale: one torso per obs group, a short
    rollout through VectorEnv, a policy-gradient update on both torsos —
    gradients flow and parameters move (hetero obs are trainable, not just
    parity-testable one env at a time)."""
    import jax
    import jax.numpy as jnp
    import optax

    from marlgrid_tpu.models import ActorCritic
    from marlgrid_tpu.parallel.ppo import PPOConfig
    from marlgrid_tpu.vector import VectorEnv

    params = EnvParams(width=9, height=9, n_agents=2, scenario="empty",
                       max_steps=10, agent_view_sizes=(5, 7),
                       agent_colors=default_agent_colors(2),
                       observation_style="encode")
    B, T = 8, 6
    env = VectorEnv(params, n_envs=B)
    cfg = PPOConfig(hidden=16, dtype=jnp.float32)
    nets = [ActorCritic(cfg) for _ in env.obs_groups]
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)
    net_params = [
        net.init(jax.random.fold_in(key, g),
                 jnp.zeros((1,) + tuple(obs[g].shape[2:]), jnp.int32))
        for g, net in enumerate(nets)]
    tx = optax.adam(1e-2)
    opt_state = tx.init(net_params)

    def rollout_loss(net_params, state, obs, key):
        total = 0.0
        for t in range(T):
            key, ak = jax.random.split(key)
            logps = []
            acts = jnp.zeros((B, params.n_agents), jnp.int32)
            for g, (idxs, gp) in enumerate(env.obs_groups):
                logits, _ = nets[g].apply(net_params[g], obs[g])
                a = jax.random.categorical(jax.random.fold_in(ak, g), logits)
                lp = jax.nn.log_softmax(logits)
                logps.append((lp * (a[..., None] == jnp.arange(7))).sum(-1))
                for col, i in enumerate(idxs):
                    acts = acts.at[:, i].set(a[:, col])
            state, obs, rew, done, info = env.step(state, acts)
            for g, (idxs, gp) in enumerate(env.obs_groups):
                r = rew[:, list(idxs)]
                total = total + (logps[g] * jax.lax.stop_gradient(r)).sum() \
                    + 1e-3 * logps[g].sum()
        return -total / (B * T)

    loss, grads = jax.value_and_grad(rollout_loss)(net_params, state, obs,
                                                   jax.random.fold_in(key, 9))
    updates, opt_state = tx.update(grads, opt_state, net_params)
    new_params = optax.apply_updates(net_params, updates)
    assert np.isfinite(float(loss))
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         net_params, new_params)
    assert max(jax.tree.leaves(moved)) > 0.0


def test_hetero_flags_parity():
    """VERDICT r2 item 7: per-agent see_through_walls / hide_item_types /
    view_offset / observe_* / prestige params in ONE env, engine vs oracle
    bit-parity (the flags fold into the per-group obs compilation exactly
    like view_size did)."""
    import jax

    agents = [
        GridAgentInterface(color="red", view_size=5,
                           observation_style="encode",
                           see_through_walls=True, prestige_beta=0.9),
        GridAgentInterface(color="blue", view_size=5,
                           observation_style="encode",
                           hide_item_types=("goal",), prestige_scale=1.0),
        GridAgentInterface(color="purple", view_size=5,
                           observation_style="rich", view_offset=1,
                           observe_rewards=True, observe_position=True,
                           observe_orientation=True),
    ]
    from marlgrid_tpu.envs import ClutteredMultiGrid

    env = ClutteredMultiGrid(agents=agents, grid_size=11, max_steps=25,
                             seed=2, n_clutter=8)
    p = env.params
    assert p.scenario == "cluttered"
    assert p.agent_see_through_walls == (True, False, False)
    assert p.agent_view_offsets == (0, 0, 1)
    assert p.agent_observe_rewards == (False, False, True)
    assert p.agent_prestige_betas == (0.9, 0.95, 0.95)
    assert p.agent_prestige_scales == (2.0, 1.0, 2.0)
    assert len(env._obs_groups) == 3

    oracle = OracleEnv(p)
    obs = env.reset()
    oobs = oracle.reset(jax.random.fold_in(env._key, 0))
    rng = np.random.default_rng(7)

    def check(a, b):
        for i in range(3):
            if isinstance(a[i], dict):
                assert set(a[i]) == set(b[i])
                for k in a[i]:
                    np.testing.assert_allclose(
                        np.asarray(a[i][k]), np.asarray(b[i][k]), atol=1e-5)
            else:
                np.testing.assert_array_equal(a[i], b[i])

    check(obs, oobs)
    for t in range(20):
        acts = rng.integers(0, 7, 3)
        obs, rew, done, _ = env.step(acts)
        oobs, orew, odone, _ = oracle.step(acts)
        np.testing.assert_allclose(rew, orew, atol=1e-5)
        assert bool(done) == odone
        check(obs, oobs)
        if done:
            break


def test_observer_subset_render_parity():
    """The hetero fast path — per-group observer-only renders against one
    shared painted board (``all_obs_encode_b(observers=…, packed=…)``) —
    is bit-identical to slicing the full-N render (round-5 rebuild of
    parallel/ppo_hetero.py and VectorEnv hetero obs)."""
    import jax
    import numpy as np

    from marlgrid_tpu.core import obs as obs_mod
    from marlgrid_tpu.parallel import ppo
    from marlgrid_tpu.vector import VectorEnv, obs_groups

    ep = EnvParams(width=11, height=11, n_agents=4, scenario="cluttered",
                   n_clutter=8, max_steps=50, view_size=5,
                   observation_style="encode",
                   agent_view_sizes=(5, 7, 5, 7),
                   agent_view_offsets=(0, 1, 0, 1),
                   agent_see_through_walls=(False, True, False, True),
                   agent_colors=default_agent_colors(4))
    env = VectorEnv(ep, n_envs=16)
    state, _ = env.reset(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(9)
    for t in range(6):   # random walk so observers face every direction
        key, ak = jax.random.split(key)
        acts = jax.random.randint(ak, (16, 4), 0, 7)
        state, obs, _, _, _ = env.step(state, acts)
        packed = obs_mod.pack_grid_with_agents(ep, state)
        for g, (idxs, gp) in enumerate(obs_groups(ep)):
            full = obs_mod.all_obs_encode_b(gp, state)   # (B, N, vs, vs, 3)
            sub = obs_mod.all_obs_encode_b(gp, state, observers=idxs,
                                           packed=packed)
            np.testing.assert_array_equal(
                np.asarray(sub), np.asarray(full[:, np.asarray(idxs)]),
                err_msg=f"t={t} group={g}")
            # the bminor (feature-major source) variant agrees too
            subm = obs_mod.all_obs_encode_b(gp, state, bminor=True,
                                            observers=idxs, packed=packed)
            np.testing.assert_array_equal(
                np.asarray(subm.transpose(4, 1, 2, 3, 0)), np.asarray(sub),
                err_msg=f"t={t} group={g} bminor")
            # and it is exactly what VectorEnv's hetero obs now returns
            np.testing.assert_array_equal(np.asarray(obs[g]),
                                          np.asarray(sub))


def test_observer_subset_image_render_parity():
    """Image analog of the observer-subset parity (round 5, mixed-style
    hetero training): ``all_obs_image_b(observers=…)`` equals slicing the
    full-N render, and a with_lvl-painted shared board serves BOTH styles
    (the encode path ignores the prestige-level bits)."""
    import jax
    import numpy as np

    from marlgrid_tpu import rendering
    from marlgrid_tpu.core import obs as obs_mod
    from marlgrid_tpu.vector import VectorEnv, obs_groups

    ep = EnvParams(width=11, height=11, n_agents=3, scenario="cluttered",
                   n_clutter=8, max_steps=50, view_size=5,
                   view_tile_size=4, observation_style="image",
                   agent_view_sizes=(5, 7, 5),
                   agent_colors=default_agent_colors(3))
    env = VectorEnv(ep, n_envs=8)
    state, _ = env.reset(jax.random.PRNGKey(5))
    key = jax.random.PRNGKey(11)
    for t in range(4):
        key, ak = jax.random.split(key)
        acts = jax.random.randint(ak, (8, 3), 0, 7)
        state, _, _, _, _ = env.step(state, acts)
        packed = obs_mod.pack_grid_with_agents(ep, state, with_lvl=True)
        for g, (idxs, gp) in enumerate(obs_groups(ep)):
            luts = (jax.numpy.asarray(rendering.base_lut(gp.view_tile_size)),
                    jax.numpy.asarray(rendering.agent_lut(gp.view_tile_size)))
            full = obs_mod.all_obs_image_b(gp, state, *luts)
            sub = obs_mod.all_obs_image_b(gp, state, *luts,
                                          observers=idxs, packed=packed)
            np.testing.assert_array_equal(
                np.asarray(sub), np.asarray(full[:, np.asarray(idxs)]),
                err_msg=f"t={t} group={g}")
        # the with_lvl board is transparent to the encode path: mixed-style
        # groups can share ONE painted board
        gp_e = obs_groups(ep)[0][1].replace(observation_style="encode")
        idxs0 = obs_groups(ep)[0][0]
        enc_full = obs_mod.all_obs_encode_b(gp_e, state)
        enc_sub = obs_mod.all_obs_encode_b(gp_e, state, observers=idxs0,
                                           packed=packed)
        np.testing.assert_array_equal(
            np.asarray(enc_sub),
            np.asarray(enc_full[:, np.asarray(idxs0)]),
            err_msg=f"t={t} encode-on-lvl-board")
