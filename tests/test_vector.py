"""VectorEnv + mesh sharding tests (SURVEY §4 item 5 — multi-host plumbing
unit-tested on the 8-device virtual CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.vector import VectorEnv

PARAMS = EnvParams(width=9, height=9, n_agents=2, scenario="cluttered",
                   n_clutter=6, max_steps=16, observation_style="encode",
                   view_size=5, agent_colors=default_agent_colors(2))


def test_vector_env_shapes():
    B = 32
    env = VectorEnv(PARAMS, n_envs=B)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (B, 2, 5, 5, 3)
    actions = jnp.zeros((B, 2), jnp.int32) + 2
    state, obs, rew, done, info = env.step(state, actions)
    assert rew.shape == (B, 2) and done.shape == (B,)
    assert set(info) == {"episode_return", "episode_length",
                         "episode_cycles"}


def test_vector_env_independent_resets():
    """independent_resets=True gives every finishing env its OWN fresh
    board (step_autoreset), instead of the shared per-step board."""
    B = 8
    params = PARAMS.replace(max_steps=3)
    env = VectorEnv(params, n_envs=B, independent_resets=True)
    state, obs = env.reset(jax.random.PRNGKey(1))
    for _ in range(3):   # all envs finish simultaneously at max_steps
        state, obs, rew, done, info = env.step(
            state, jnp.zeros((B, 2), jnp.int32) + 6)   # 'done' no-ops
    assert bool(done.all())
    boards = np.asarray(state.grid_type)
    distinct = {boards[b].tobytes() for b in range(B)}
    assert len(distinct) > 1, "fresh boards must differ across envs"


def test_vector_env_matches_single(devices8):
    """Batched trajectories equal per-env trajectories (vmap correctness)."""
    B = 4
    env = VectorEnv(PARAMS, n_envs=B, auto_reset=False)
    key = jax.random.PRNGKey(3)
    state, obs = env.reset(key)
    acts = jax.random.randint(jax.random.fold_in(key, 9), (5, B, 2), 0, 7)
    outs = []
    for t in range(5):
        state, obs, rew, done, _ = env.step(state, acts[t])
        outs.append((np.asarray(obs), np.asarray(rew)))

    from marlgrid_tpu.core import grid_gen, obs as obs_mod, step as step_mod

    keys = jax.random.split(key, B)
    for b in range(B):
        s = jax.jit(lambda k: grid_gen.reset(PARAMS, k))(keys[b])
        for t in range(5):
            s, rew, _ = jax.jit(
                lambda s, a: step_mod.step(PARAMS, s, a))(s, acts[t, b])
            o = jax.jit(lambda s: obs_mod.all_agent_obs(PARAMS, s))(s)
            np.testing.assert_array_equal(outs[t][0][b], np.asarray(o))
            np.testing.assert_allclose(outs[t][1][b], np.asarray(rew),
                                       atol=1e-6)


def test_sharded_vector_env(devices8):
    """Env batch sharded over an 8-device mesh: state lives distributed,
    stepping runs SPMD with no cross-env collectives (SURVEY §2.3)."""
    mesh = Mesh(np.array(devices8), ("env",))
    sharding = NamedSharding(mesh, P("env"))
    B = 64
    env = VectorEnv(PARAMS, n_envs=B, sharding=sharding)
    state, obs = env.reset(jax.random.PRNGKey(0))
    # batch axis is actually distributed
    assert len(state.grid_type.sharding.device_set) == 8
    actions = jnp.zeros((B, 2), jnp.int32) + 2
    for _ in range(3):
        state, obs, rew, done, info = env.step(state, actions)
    assert obs.shape == (B, 2, 5, 5, 3)
    assert len(obs.sharding.device_set) == 8


def test_rollout_fn(devices8):
    B, T = 16, 8
    env = VectorEnv(PARAMS, n_envs=B)
    state, _ = env.reset(jax.random.PRNGKey(0))

    def policy(_, obs, key):
        return jax.random.randint(key, (B, PARAMS.n_agents), 0, 7)

    fn = env.rollout_fn(policy, T)
    state2, traj = fn(None, state, jax.random.PRNGKey(1))
    assert traj["obs"].shape == (T, B, 2, 5, 5, 3)
    assert traj["rew"].shape == (T, B, 2)
    assert traj["done"].shape == (T, B)


def test_vector_env_rich_obs():
    """Batched 'rich' observation style: dict of batched arrays (pov +
    observe_* fields), matching the host wrapper's per-agent dicts."""
    import numpy as np

    from marlgrid_tpu.wrapper import MultiGridEnv, env_params_for

    p = env_params_for("cluttered", 11, 2, n_clutter=6, max_steps=20,
                       observation_style="rich", view_size=5,
                       view_tile_size=4, observe_rewards=True,
                       observe_position=True, observe_orientation=True)
    env = VectorEnv(p, n_envs=4)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert set(obs) == {"pov", "reward", "position", "orientation"}
    assert obs["pov"].shape == (4, 2, 20, 20, 3)
    acts = jnp.zeros((4, 2), jnp.int32)
    state, obs, rew, done, info = env.step(state, acts)
    assert obs["reward"].shape == (4, 2)
    assert obs["position"].shape == (4, 2, 2)
    # agreement with the single-env host wrapper's rich dict on env 0
    host = MultiGridEnv(params=p, seed=0)
    host.reset()
    host.state = jax.tree.map(lambda x: x[0], state)
    hobs = host._host_obs()
    np.testing.assert_array_equal(np.asarray(obs["pov"])[0, 1],
                                  hobs[1]["pov"])
    assert hobs[1]["orientation"] == int(np.asarray(obs["orientation"])[0, 1])
