"""API polish parity items: gymnasium registry bridge, agent_spawn_kwargs,
reset_on_cycle, IndependentLearners aggregate spaces, human-mode render
(SURVEY §2.1/§3.1 [M]/[L] rows)."""
import jax
import jax.numpy as jnp
import numpy as np

import marlgrid_tpu  # noqa: F401  (import-time registration)
from marlgrid_tpu.agents import GridAgentInterface, IndependentLearners
from marlgrid_tpu.core import constants as C
from marlgrid_tpu.core import grid_gen, step as step_mod
from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.oracle import OracleEnv
from marlgrid_tpu.wrapper import MultiGridEnv


def test_gymnasium_make_finds_registered_ids():
    import gymnasium

    env = gymnasium.make("MarlGrid-3AgentCluttered15x15-v0", seed=4)
    # gymnasium may hand back the raw env (checker/order-enforce disabled)
    base = env.unwrapped if hasattr(env, "unwrapped") else env
    assert isinstance(base, MultiGridEnv)
    obs = base.reset()
    assert len(obs) == 3
    obs, rew, done, info = base.step([0, 1, 2])
    assert len(obs) == 3 and rew.shape == (3,)


def test_agent_spawn_region_engine_and_oracle():
    params = EnvParams(width=13, height=13, n_agents=3, scenario="cluttered",
                       n_clutter=8, agent_spawn_top=(1, 1),
                       agent_spawn_size=(4, 4),
                       agent_colors=default_agent_colors(3),
                       observation_style="encode")
    for seed in range(5):
        s = grid_gen.reset(params, jax.random.PRNGKey(seed))
        pos = np.asarray(s.agent_pos)
        assert (pos >= 1).all() and (pos < 5).all(), pos
        oracle = OracleEnv(params)
        oracle.reset(jax.random.PRNGKey(seed))
        np.testing.assert_array_equal(pos, oracle.agent_pos)


def test_agent_spawn_kwargs_ctor():
    env = MultiGridEnv(grid_size=13, agent_spawn_kwargs={"top": (1, 1),
                                                         "size": (3, 3)})
    assert env.params.agent_spawn_top == (1, 1)
    assert env.params.agent_spawn_size == (3, 3)
    env.reset(seed=0)
    assert env.agents[0].pos[0] < 4 and env.agents[0].pos[1] < 4


def _walk_cycle(params, positions):
    """Author a board with bonus tiles at known spots and walk them."""
    env = MultiGridEnv(params=params)
    env.reset(seed=2)
    enc = env.encode()
    for x, y in zip(*np.nonzero((enc[..., 0] == C.BONUS)
                                | (enc[..., 0] == C.GOAL))):
        env._set_cell_host(int(x), int(y), (C.EMPTY, 0, 0))
    for b, (x, y) in enumerate(positions):
        assert env.place_obj((C.BONUS, C.COLOR_TO_IDX["pink"], b),
                             top=(x, y), size=(1, 1)) == (x, y)
    env.place_agent(0, top=(positions[0][0] - 1, positions[0][1]),
                    size=(1, 1), dir=0)
    return env


def test_reset_on_cycle_done_and_cycle_count():
    base = dict(width=9, height=9, n_agents=1, scenario="goal_cycle",
                n_clutter=0, n_bonus_tiles=3, reward_decay=False,
                max_steps=60, agent_colors=default_agent_colors(1),
                observation_style="encode")
    positions = [(3, 4), (4, 4), (5, 4)]   # east-walk visits 0, 1, 2

    env = _walk_cycle(EnvParams(reset_on_cycle=True, **base), positions)
    dones = []
    for _ in range(3):
        _, rew, done, _ = env.step([C.FORWARD])
        np.testing.assert_allclose(rew, [1.0])   # in-order visits
        dones.append(bool(done))
    assert dones == [False, False, True], "done fires on cycle completion"
    assert int(env.state.cycles[0]) == 1

    env2 = _walk_cycle(EnvParams(reset_on_cycle=False, **base), positions)
    for _ in range(3):
        _, _, done, _ = env2.step([C.FORWARD])
    assert not bool(done), "without reset_on_cycle the episode continues"
    assert int(env2.state.cycles[0]) == 1


def test_reset_on_cycle_oracle_parity():
    params = EnvParams(width=11, height=11, n_agents=2,
                       scenario="goal_cycle", n_clutter=4, n_bonus_tiles=2,
                       reset_on_cycle=True, reward_decay=False, max_steps=40,
                       agent_colors=default_agent_colors(2),
                       observation_style="encode")
    rng = np.random.default_rng(3)
    T = 44
    actions = rng.integers(0, 7, (T, params.n_agents))

    @jax.jit
    def run(key, actions):
        s0 = grid_gen.reset(params, key)

        def body(s, a):
            s2, rew, done = step_mod.step(params, s, a)
            return s2, (rew, done, s2.cycles)

        _, out = jax.lax.scan(body, s0, actions)
        return out

    rews, dones, cycs = jax.device_get(
        run(jax.random.PRNGKey(5), jnp.asarray(actions, jnp.int32)))
    oracle = OracleEnv(params)
    oracle.reset(jax.random.PRNGKey(5))
    for t in range(T):
        _, orew, odone, _ = oracle.step(actions[t])
        np.testing.assert_allclose(rews[t], orew, atol=1e-5)
        np.testing.assert_array_equal(cycs[t], oracle.cycles)
        assert bool(dones[t]) == odone, f"t={t}"


def test_independent_learners_aggregate_spaces():
    agents = [GridAgentInterface(color="red", observation_style="encode"),
              GridAgentInterface(color="blue", observation_style="encode")]
    learners = IndependentLearners(*agents)
    from gymnasium import spaces

    assert isinstance(learners.observation_space, spaces.Tuple)
    assert len(learners.observation_space.spaces) == 2
    assert isinstance(learners.action_space, spaces.Tuple)
    assert learners.action_space[0].n == C.N_ACTIONS


def test_render_human_headless(tmp_path, monkeypatch):
    monkeypatch.delenv("DISPLAY", raising=False)
    env = MultiGridEnv(grid_size=9, max_steps=5)
    env.reset(seed=0)
    img = env.render(mode="human", tile_size=8)
    assert img.shape == (72, 72, 3)
    assert env._viewer is not None   # viewer engaged (saves frames headless)
    env.close()
    assert env._viewer is None


def test_gymnasium_5tuple_adapter():
    from marlgrid_tpu.wrapper import GymnasiumMultiGridEnv

    env = GymnasiumMultiGridEnv(grid_size=9, max_steps=3, seed=0)
    obs, info = env.reset(seed=1)
    assert isinstance(obs, tuple) and len(obs) == 1
    for _ in range(3):   # 'done' action no-ops until the step limit
        obs, rew, terminated, truncated, info = env.step([6])
    assert truncated and not terminated

    # terminated (not truncated) when the only agent reaches a goal
    env2 = GymnasiumMultiGridEnv(grid_size=9, max_steps=50, seed=0,
                                 reward_decay=False)
    env2.reset(seed=3)
    enc = env2.encode()
    for x, y in zip(*np.nonzero(enc[..., 0] == C.GOAL)):
        env2._set_cell_host(int(x), int(y), (C.EMPTY, 0, 0))
    env2.place_obj((C.GOAL, 3, 0), top=(5, 5), size=(1, 1))
    env2.place_agent(0, top=(4, 5), size=(1, 1), dir=0)
    _, rew, terminated, truncated, _ = env2.step([C.FORWARD])
    assert terminated and not truncated and rew[0] == 1.0


def test_gymnasium_make_render_mode():
    import gymnasium

    env = gymnasium.make("MarlGrid-3AgentCluttered15x15-v0",
                         render_mode="rgb_array")
    base = env.unwrapped if hasattr(env, "unwrapped") else env
    assert base.render_mode == "rgb_array"
    base.reset()
    assert base.render().shape[-1] == 3


def test_gymnasium_adapter_terminal_at_step_limit():
    """Goal reached exactly when the step limit hits: both flags true."""
    from marlgrid_tpu.wrapper import GymnasiumMultiGridEnv

    env = GymnasiumMultiGridEnv(grid_size=9, max_steps=1, seed=0,
                                reward_decay=False)
    env.reset(seed=3)
    enc = env.encode()
    for x, y in zip(*np.nonzero(enc[..., 0] == C.GOAL)):
        env._set_cell_host(int(x), int(y), (C.EMPTY, 0, 0))
    env.place_obj((C.GOAL, 3, 0), top=(5, 5), size=(1, 1))
    env.place_agent(0, top=(4, 5), size=(1, 1), dir=0)
    _, rew, terminated, truncated, _ = env.step([C.FORWARD])
    assert terminated and truncated and rew[0] == 1.0


def test_bare_goal_encodes_uniform_reward_index():
    """ADVICE r2: a bare Goal() under a goal_rewards table must encode the
    uniform goal_reward's table index, not state 0."""
    from marlgrid_tpu.objects import Goal

    ep = EnvParams(width=9, height=9, n_agents=1, scenario="empty",
                   goal_reward=1.0, goal_rewards=(0.5, 1.0, 2.0),
                   agent_colors=default_agent_colors(1))
    t, c, s = grid_gen.encode_obj_cell(Goal(), ep)
    assert s == 1  # index of 1.0 in the table
    # uniform reward absent from the table -> loud error, not silent 0.5
    ep2 = EnvParams(width=9, height=9, n_agents=1, scenario="empty",
                    goal_reward=1.0, goal_rewards=(0.5, 2.0),
                    agent_colors=default_agent_colors(1))
    import pytest
    with pytest.raises(ValueError, match="uniform goal_reward"):
        grid_gen.encode_obj_cell(Goal(), ep2)


def test_place_obj_raw_triple_validated():
    """ADVICE r2: raw (type, color, state) triples get the same reward
    table-bounds validation as WorldObjs."""
    import pytest

    ep = EnvParams(width=9, height=9, n_agents=1, scenario="empty",
                   goal_rewards=(1.0, 2.0),
                   agent_colors=default_agent_colors(1))
    env = MultiGridEnv(params=ep, seed=0)
    env.reset()
    with pytest.raises(ValueError, match="goal_rewards"):
        env.place_obj((C.GOAL, 3, 7))       # state 7 outside the table
    assert env.place_obj((C.GOAL, 3, 1)) is not None


def test_render_honors_env_render_mode(monkeypatch):
    """ADVICE r2: gymnasium.make(id, render_mode='human') + env.render()
    must route through the human viewer."""
    import gymnasium

    monkeypatch.delenv("DISPLAY", raising=False)
    env = gymnasium.make("MarlGrid-1AgentEmpty9x9-v0", render_mode="human")
    base = env.unwrapped if hasattr(env, "unwrapped") else env
    base.reset()
    img = base.render()                      # no explicit mode
    assert img.shape[-1] == 3
    assert base._viewer is not None          # human path engaged
    base.close()
