"""Per-object reward plumbing (``marlgrid/objects.py — §Goal(reward, color)``
[H], ``§BonusTile(reward, penalty)`` [M], SURVEY §2.1).

A ``Goal(reward=r)`` placed by a scenario or host-side ``place_obj`` must pay
``r`` — the reward magnitude rides the goal cell's state field as an index
into the static ``EnvParams.goal_rewards`` table; bonus tiles pay per-tile
magnitudes from ``bonus_rewards``/``bonus_penalties`` indexed by bonus_id.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import marlgrid_tpu.objects as O
from marlgrid_tpu.core import constants as C
from marlgrid_tpu.core import grid_gen, obs as obs_mod, step as step_mod
from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.oracle import OracleEnv
from marlgrid_tpu.wrapper import MultiGridEnv


def _richgoals_engine(params, layers, split_x, door_y):
    """Custom scenario: a cheap goal and a jackpot goal."""
    events = [O.Goal(reward=1.0), O.Goal(reward=2.5, color="yellow")]
    return layers, events, None


def _richgoals_oracle(oracle):
    oracle._place_obj(O.Goal(reward=1.0))
    oracle._place_obj(O.Goal(reward=2.5, color="yellow"))
    return None


grid_gen.register_scenario("richgoals", _richgoals_engine, 2,
                           oracle_builder=_richgoals_oracle)


def test_goal_reward_encoded_in_state_field():
    params = EnvParams(width=9, height=9, n_agents=1, scenario="richgoals",
                       goal_rewards=(1.0, 2.5),
                       agent_colors=default_agent_colors(1),
                       observation_style="encode")
    s = grid_gen.reset(params, jax.random.PRNGKey(0))
    gt = np.asarray(s.grid_type)
    gs = np.asarray(s.grid_state)
    goal_states = sorted(gs[gt == C.GOAL].tolist())
    assert goal_states == [0, 1]


def test_goal_reward_paid_engine_and_oracle():
    """Walk an agent onto the jackpot goal: engine pays 2.5, oracle agrees."""
    params = EnvParams(width=9, height=9, n_agents=1, scenario="richgoals",
                       goal_rewards=(1.0, 2.5), reward_decay=False,
                       max_steps=50, agent_colors=default_agent_colors(1),
                       observation_style="encode")
    env = MultiGridEnv(params=params)
    env.reset(seed=3)
    # clear the random goals, then author the board deterministically
    enc = env.encode()
    for x, y in zip(*np.nonzero(enc[..., 0] == C.GOAL)):
        env._set_cell_host(int(x), int(y), (C.EMPTY, 0, 0))
    at = env.place_obj(O.Goal(reward=2.5, color="yellow"), top=(5, 5),
                       size=(1, 1))
    assert at == (5, 5)
    assert tuple(env.encode()[5, 5]) == (C.GOAL, C.COLOR_TO_IDX["yellow"], 1)
    env.place_agent(0, top=(4, 5), size=(1, 1), dir=0)   # facing east
    _, rew, done, _ = env.step([C.FORWARD])
    np.testing.assert_allclose(rew, [2.5])
    assert done  # only agent deactivated on the goal


def test_goal_reward_trajectory_parity():
    params = EnvParams(width=11, height=11, n_agents=2, scenario="richgoals",
                       goal_rewards=(1.0, 2.5), max_steps=40, respawn=True,
                       agent_colors=default_agent_colors(2),
                       observation_style="encode")
    rng = np.random.default_rng(11)
    T = 60
    actions = rng.integers(0, 7, (T, params.n_agents))

    @jax.jit
    def run(key, actions):
        s0 = grid_gen.reset(params, key)

        def body(s, a):
            s2, rew, done = step_mod.step(params, s, a)
            return s2, (rew, done, obs_mod.all_agent_obs(params, s2))

        _, out = jax.lax.scan(body, s0, actions)
        return out

    rews, dones, obss = jax.device_get(
        run(jax.random.PRNGKey(7), jnp.asarray(actions, jnp.int32)))
    oracle = OracleEnv(params)
    oracle.reset(jax.random.PRNGKey(7))
    total = 0.0
    for t in range(T):
        oobs, orew, odone, _ = oracle.step(actions[t])
        np.testing.assert_allclose(rews[t], orew, atol=1e-5,
                                   err_msg=f"t={t}")
        assert bool(dones[t]) == odone
        for i in range(params.n_agents):
            np.testing.assert_array_equal(obss[t, i], oobs[i])
        total += float(np.sum(orew))


def test_bonus_per_tile_magnitudes():
    """Stepped-on tile's bonus_id indexes the reward/penalty tables."""
    params = EnvParams(width=9, height=9, n_agents=1, scenario="empty",
                       n_bonus_tiles=3, reward_decay=False, max_steps=50,
                       bonus_rewards=(1.0, 3.0, 0.25),
                       bonus_penalties=(0.5, 0.75, 2.0),
                       agent_colors=default_agent_colors(1),
                       observation_style="encode")
    env = MultiGridEnv(params=params)
    env.reset(seed=5)
    enc = env.encode()
    for x, y in zip(*np.nonzero(enc[..., 0] == C.GOAL)):
        env._set_cell_host(int(x), int(y), (C.EMPTY, 0, 0))
    assert env.place_obj(O.BonusTile(bonus_id=1, reward=3.0, penalty=0.75),
                         top=(5, 5), size=(1, 1)) == (5, 5)
    assert env.place_obj(O.BonusTile(bonus_id=0, reward=1.0, penalty=0.5),
                         top=(6, 5), size=(1, 1)) == (6, 5)
    env.place_agent(0, top=(4, 5), size=(1, 1), dir=0)
    _, rew, _, _ = env.step([C.FORWARD])     # first visit: tile 1 reward
    np.testing.assert_allclose(rew, [3.0])
    _, rew, _, _ = env.step([C.FORWARD])     # out-of-order: tile 0 penalty
    np.testing.assert_allclose(rew, [-0.5])


def test_goal_cycle_per_tile_parity():
    params = EnvParams(width=11, height=11, n_agents=2, scenario="goal_cycle",
                       n_clutter=6, n_bonus_tiles=3, max_steps=40,
                       bonus_rewards=(1.0, 3.0, 0.25),
                       bonus_penalties=(0.5, 0.75, 2.0),
                       reward_decay=False,
                       agent_colors=default_agent_colors(2),
                       observation_style="encode")
    rng = np.random.default_rng(13)
    T = 44
    actions = rng.integers(0, 7, (T, params.n_agents))

    @jax.jit
    def run(key, actions):
        s0 = grid_gen.reset(params, key)

        def body(s, a):
            s2, rew, done = step_mod.step(params, s, a)
            return s2, (rew, done)

        _, out = jax.lax.scan(body, s0, actions)
        return out

    rews, dones = jax.device_get(
        run(jax.random.PRNGKey(17), jnp.asarray(actions, jnp.int32)))
    oracle = OracleEnv(params)
    oracle.reset(jax.random.PRNGKey(17))
    for t in range(T):
        _, orew, odone, _ = oracle.step(actions[t])
        np.testing.assert_allclose(rews[t], orew, atol=1e-5,
                                   err_msg=f"t={t}")
        assert bool(dones[t]) == odone


def test_unrepresentable_goal_reward_raises():
    params = EnvParams(width=9, height=9, n_agents=1, scenario="empty",
                       agent_colors=default_agent_colors(1),
                       observation_style="encode")
    with pytest.raises(ValueError, match="goal_rewards"):
        grid_gen.encode_obj_cell(O.Goal(reward=2.0), params)
    p2 = params.replace(goal_rewards=(1.0, 2.0))
    assert grid_gen.encode_obj_cell(O.Goal(reward=2.0), p2)[2] == 1
    with pytest.raises(ValueError, match="goal_rewards"):
        grid_gen.encode_obj_cell(O.Goal(reward=9.0), p2)
    with pytest.raises(ValueError, match="bonus_rewards"):
        grid_gen.encode_obj_cell(O.BonusTile(bonus_id=0, reward=7.0), params)


def test_default_goal_defers_to_params_reward():
    """Goal() without an explicit reward pays params.goal_reward — custom
    scenarios written before per-object rewards keep working."""

    def _engine(params, layers, split_x, door_y):
        return layers, [O.Goal()], None

    def _oracle(oracle):
        oracle._place_obj(O.Goal())
        return None

    grid_gen.register_scenario("defergoal", _engine, 1,
                               oracle_builder=_oracle)
    params = EnvParams(width=9, height=9, n_agents=1, scenario="defergoal",
                       goal_reward=0.5, reward_decay=False, max_steps=30,
                       agent_colors=default_agent_colors(1),
                       observation_style="encode")
    env = MultiGridEnv(params=params)
    env.reset(seed=1)
    enc = env.encode()
    for x, y in zip(*np.nonzero(enc[..., 0] == C.GOAL)):
        env._set_cell_host(int(x), int(y), (C.EMPTY, 0, 0))
    env.place_obj(O.Goal(), top=(5, 5), size=(1, 1))
    assert env.encode()[5, 5, 2] == 0        # state stays 0 (uniform pay)
    env.place_agent(0, top=(4, 5), size=(1, 1), dir=0)
    _, rew, _, _ = env.step([C.FORWARD])
    np.testing.assert_allclose(rew, [0.5])
