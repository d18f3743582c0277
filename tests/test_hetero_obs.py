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


def test_vector_env_rejects_hetero():
    params = EnvParams(width=9, height=9, n_agents=2, scenario="empty",
                       agent_view_sizes=(5, 7),
                       agent_colors=default_agent_colors(2),
                       observation_style="encode")
    from marlgrid_tpu.vector import VectorEnv

    with pytest.raises(AssertionError, match="homogeneous"):
        VectorEnv(params, n_envs=4)
