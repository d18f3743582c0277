"""Host API surface tests: registry ids, spaces, gym-classic step shape,
recorder — the reference's user-facing contract (SURVEY §2.1, §3.3)."""
import numpy as np
import pytest

import marlgrid_tpu
from marlgrid_tpu.agents import GridAgentInterface, IndependentLearners
from marlgrid_tpu.envs import (ClutteredGoalCycleEnv, REGISTRY,
                               env_from_config, make, register_marl_env)
from marlgrid_tpu.utils.video import GridRecorder


def test_registry_default_ids():
    assert "MarlGrid-3AgentCluttered15x15-v0" in REGISTRY
    assert "MarlGrid-1AgentEmpty9x9-v0" in REGISTRY
    assert "MarlGrid-4AgentClutteredGoalCycle13x13-v0" in REGISTRY


def test_register_custom():
    eid = register_marl_env("MarlGrid-TestCustom-v0", "empty", n_agents=2,
                            grid_size=9, view_size=5,
                            observation_style="encode")
    env = make(eid)
    obs = env.reset()
    assert len(obs) == 2 and obs[0].shape == (5, 5, 3)


def test_gym_classic_step_shape():
    env = make("MarlGrid-2AgentEmpty9x9-v0", seed=0)
    obs = env.reset()
    assert isinstance(obs, list) and len(obs) == 2
    side = env.params.view_size * env.params.view_tile_size
    assert obs[0].shape == (side, side, 3) and obs[0].dtype == np.uint8
    out = env.step([2, 2])
    assert isinstance(out, tuple) and len(out) == 4
    obs2, rew, done, info = out
    assert len(obs2) == 2
    assert rew.shape == (2,) and rew.dtype == np.float32
    assert isinstance(done, bool) and isinstance(info, dict)
    assert len(env.action_space) == 2
    assert env.action_space[0].n == 7
    assert env.observation_space[0].shape == (side, side, 3)


def test_seed_determinism():
    e1 = make("MarlGrid-2AgentEmpty9x9-v0", seed=42)
    e2 = make("MarlGrid-2AgentEmpty9x9-v0", seed=42)
    o1, o2 = e1.reset(), e2.reset()
    np.testing.assert_array_equal(o1[0], o2[0])
    for _ in range(5):
        a = [2, 1]
        r1 = e1.step(a)
        r2 = e2.step(a)
        np.testing.assert_array_equal(r1[0][0], r2[0][0])
        np.testing.assert_array_equal(r1[1], r2[1])


def test_encode_and_render():
    env = make("MarlGrid-2AgentDoorKey11x11-v0", seed=1)
    env.reset()
    enc = env.encode()
    assert enc.shape == (11, 11, 3)
    img = env.render(tile_size=8)
    assert img.shape == (88, 88, 3) and img.dtype == np.uint8
    img2 = env.render(tile_size=8, highlight=False)
    assert img2.shape == img.shape


def test_rich_observation_style():
    agents = [GridAgentInterface(color="red", view_size=5,
                                 observation_style="rich",
                                 observe_rewards=True,
                                 observe_position=True,
                                 observe_orientation=True)]
    env = marlgrid_tpu.envs.EmptyMultiGrid(agents=agents, grid_size=9,
                                           max_steps=10, seed=0)
    obs = env.reset()
    d = obs[0]
    assert set(d) == {"pov", "reward", "position", "orientation"}
    assert d["pov"].dtype == np.uint8
    obs2, rew, done, _ = env.step([2])
    assert isinstance(obs2[0]["reward"], float)
    sp = env.observation_space[0]
    assert "position" in sp.spaces and "reward" in sp.spaces

    # observe_rewards=False (the default) omits the reward entry — the
    # kwarg is honored, not just accepted (``GridAgentInterface
    # (observe_rewards)`` [M])
    agents2 = [GridAgentInterface(color="red", view_size=5,
                                  observation_style="rich")]
    env2 = marlgrid_tpu.envs.EmptyMultiGrid(agents=agents2, grid_size=9,
                                            max_steps=10, seed=0)
    d2 = env2.reset()[0]
    assert set(d2) == {"pov"}
    assert "reward" not in env2.observation_space[0].spaces


def test_env_from_config():
    env = env_from_config(dict(env_class="ClutteredGoalCycleEnv", n_agents=4,
                               grid_size=13, max_steps=20, n_bonus_tiles=3,
                               view_size=7, observation_style="encode"))
    assert isinstance(env, ClutteredGoalCycleEnv)
    assert env.params.reward_decay is False  # goal-cycle default (SPEC §6)
    obs = env.reset()
    assert len(obs) == 4 and obs[0].shape == (7, 7, 3)


def test_grid_recorder(tmp_path):
    env = make("MarlGrid-1AgentEmpty9x9-v0", seed=0)
    rec = GridRecorder(env, tile_size=8)
    rec.reset()
    for _ in range(3):
        rec.step([2])
    assert len(rec.frames) == 4
    out = rec.export_video(str(tmp_path / "ep.gif"), fps=4)
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_independent_learners():
    class Fixed:
        def __init__(self, a):
            self.a = a

        def action_step(self, obs):
            return self.a

    learners = IndependentLearners(Fixed(2), Fixed(1))
    env = make("MarlGrid-2AgentEmpty9x9-v0", seed=0)
    obs = env.reset()
    with learners.episode():
        acts = learners.action_step(obs)
        assert acts == [2, 1]
        obs, rew, done, _ = env.step(acts)
        learners.save_step(obs, acts, rew, done)


def test_str_render():
    """ASCII board (``WorldObj.str_render`` [M]): border walls, goal, agent
    arrow; shape (height lines x 2*width chars)."""
    from marlgrid_tpu.core import constants as C

    env = make("MarlGrid-1AgentEmpty9x9-v0", seed=0)
    env.reset()
    s = str(env)
    lines = s.split("\n")
    assert len(lines) == 9 and all(len(ln) == 18 for ln in lines)
    assert lines[0] == "WG" * 9 and lines[-1] == "WG" * 9  # grey wall border
    assert "GG" in s  # green goal somewhere
    assert any(a in s for a in (">R", "vR", "<R", "^R"))  # red agent arrow
    assert C.str_render(C.DOOR, 2, C.DOOR_LOCKED) == "DL"


def test_place_obj_and_place_agent():
    """Host-side ``place_obj``/``place_agent`` (``MultiGridEnv.place_obj``,
    SURVEY §3.2): rejection-sampled free cell, state mutated, engine keeps
    stepping from the edited board."""
    from marlgrid_tpu import objects as O
    from marlgrid_tpu.core import constants as C

    env = make("MarlGrid-2AgentEmpty9x9-v0", seed=4)
    env.reset()
    at = env.place_obj(O.Ball("purple"))
    assert at is not None
    x, y = at
    assert tuple(env.encode()[x, y]) == (C.BALL, C.COLOR_TO_IDX["purple"], 0)
    # region-restricted placement with a reject_fn
    at2 = env.place_obj(O.Key("red"), top=(1, 1), size=(3, 3),
                        reject_fn=lambda e, pos: pos == (1, 1))
    assert at2 is not None and at2 != (1, 1)
    assert 1 <= at2[0] <= 3 and 1 <= at2[1] <= 3
    at3 = env.place_agent(0, dir=2)
    assert at3 is not None and env.agents[0].dir == 2
    assert env.agents[0].pos == at3
    obs, rew, done, _ = env.step([2, 2])  # engine still steps cleanly
    assert len(obs) == 2
