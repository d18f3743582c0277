"""Object-interaction state machines on constructed boards (SPEC §2, §5).

No scenario places balls/boxes/lava (the reference's envs don't either —
SURVEY §2.1), so these paths get dedicated constructed-state coverage:
pickup/drop of balls, box toggle revealing contents, lava death, door
open/close cycling.
"""
import jax
import jax.numpy as jnp
import numpy as np

from marlgrid_tpu.core import constants as C
from marlgrid_tpu.core import step as step_mod
from marlgrid_tpu.core.grid_gen import bordered_layers
from marlgrid_tpu.core.state import EnvParams, default_agent_colors, \
    zeros_state

P1 = EnvParams(width=8, height=8, n_agents=1,
               agent_colors=default_agent_colors(1), max_steps=50)


def mk_state(params, cells, agent_pos, agent_dir, seed=0):
    """Bordered room + hand-placed cells; agent pinned."""
    s = zeros_state(params, jax.random.PRNGKey(seed))
    gt, gc, gs = bordered_layers(params)
    for (x, y), (t, c, st) in cells.items():
        gt = gt.at[x, y].set(t)
        gc = gc.at[x, y].set(c)
        gs = gs.at[x, y].set(st)
    s.grid_type, s.grid_color, s.grid_state = (
        gt.reshape(-1), gc.reshape(-1), gs.reshape(-1))
    s.agent_pos = jnp.asarray([agent_pos], jnp.int32)
    s.agent_dir = jnp.asarray([agent_dir], jnp.int32)
    s.active = jnp.ones((1,), bool)
    return s


def run(params, s, actions):
    step = jax.jit(lambda s, a: step_mod.step(params, s, a))
    out = []
    for a in actions:
        s, rew, done = step(s, jnp.asarray([a], jnp.int32))
        out.append((jax.device_get(s), float(rew[0]), bool(done)))
    return out


def cell_of(params, s, x, y):
    W, H = params.width, params.height
    return (int(np.asarray(s.grid_type).reshape(W, H)[x, y]),
            int(np.asarray(s.grid_color).reshape(W, H)[x, y]),
            int(np.asarray(s.grid_state).reshape(W, H)[x, y]))


def test_ball_pickup_and_drop():
    blue = C.COLOR_TO_IDX["blue"]
    s = mk_state(P1, {(3, 3): (C.BALL, blue, 0)}, (2, 3), 0)  # facing ball
    out = run(P1, s, [C.PICKUP, C.LEFT, C.LEFT, C.DROP])
    s1 = out[0][0]
    assert cell_of(P1, s1, 3, 3) == (C.EMPTY, 0, 0)
    assert int(s1.carry_type[0]) == C.BALL
    assert int(s1.carry_color[0]) == blue
    # after two lefts the agent faces west -> drop at (1,3)
    s4 = out[3][0]
    assert cell_of(P1, s4, 1, 3) == (C.BALL, blue, 0)
    assert int(s4.carry_type[0]) == C.EMPTY


def test_drop_blocked_by_object():
    blue = C.COLOR_TO_IDX["blue"]
    red = C.COLOR_TO_IDX["red"]
    s = mk_state(P1, {(3, 3): (C.BALL, blue, 0), (1, 3): (C.KEY, red, 0)},
                 (2, 3), 0)
    out = run(P1, s, [C.PICKUP, C.LEFT, C.LEFT, C.DROP])
    s4 = out[3][0]
    # (1,3) already holds a key -> drop refused, still carrying
    assert cell_of(P1, s4, 1, 3) == (C.KEY, red, 0)
    assert int(s4.carry_type[0]) == C.BALL


def test_box_toggle_reveals_contents():
    purple = C.COLOR_TO_IDX["purple"]
    yellow = C.COLOR_TO_IDX["yellow"]
    packed = C.box_pack(C.KEY, yellow)
    s = mk_state(P1, {(3, 3): (C.BOX, purple, packed)}, (2, 3), 0)
    out = run(P1, s, [C.TOGGLE])
    s1 = out[0][0]
    assert cell_of(P1, s1, 3, 3) == (C.KEY, yellow, 0)


def test_empty_box_toggle_vanishes():
    purple = C.COLOR_TO_IDX["purple"]
    s = mk_state(P1, {(3, 3): (C.BOX, purple, 0)}, (2, 3), 0)
    out = run(P1, s, [C.TOGGLE])
    assert cell_of(P1, out[0][0], 3, 3) == (C.EMPTY, 0, 0)


def test_box_is_carryable_with_contents():
    purple = C.COLOR_TO_IDX["purple"]
    packed = C.box_pack(C.BALL, C.COLOR_TO_IDX["blue"])
    s = mk_state(P1, {(3, 3): (C.BOX, purple, packed)}, (2, 3), 0)
    out = run(P1, s, [C.PICKUP, C.DROP])
    s1 = out[0][0]
    assert int(s1.carry_type[0]) == C.BOX
    assert int(s1.carry_state[0]) == packed  # contents ride along
    s2 = out[1][0]
    assert cell_of(P1, s2, 3, 3) == (C.BOX, purple, packed)


def test_lava_kills():
    s = mk_state(P1, {(3, 3): (C.LAVA, C.COLOR_TO_IDX["orange"], 0)},
                 (2, 3), 0)
    params = P1.replace(lava_penalty=-1.0)
    out = run(params, s, [C.FORWARD])
    s1, rew, done = out[0]
    assert not bool(s1.active[0])
    assert tuple(int(v) for v in s1.agent_pos[0]) == (3, 3)
    assert rew < 0  # decayed lava penalty
    assert done    # sole agent dead -> episode over


def test_door_open_close_cycle():
    blue = C.COLOR_TO_IDX["blue"]
    s = mk_state(P1, {(3, 3): (C.DOOR, blue, C.DOOR_CLOSED)}, (2, 3), 0)
    out = run(P1, s, [C.TOGGLE, C.TOGGLE, C.TOGGLE])
    assert cell_of(P1, out[0][0], 3, 3)[2] == C.DOOR_OPEN
    assert cell_of(P1, out[1][0], 3, 3)[2] == C.DOOR_CLOSED
    assert cell_of(P1, out[2][0], 3, 3)[2] == C.DOOR_OPEN


def test_locked_door_needs_matching_key():
    blue = C.COLOR_TO_IDX["blue"]
    red = C.COLOR_TO_IDX["red"]
    cells = {(3, 3): (C.DOOR, blue, C.DOOR_LOCKED),
             (1, 3): (C.KEY, red, 0)}
    s = mk_state(P1, cells, (2, 3), 0)
    # toggle with no key: stays locked
    out = run(P1, s, [C.TOGGLE])
    assert cell_of(P1, out[0][0], 3, 3)[2] == C.DOOR_LOCKED
    # wrong-color key: stays locked
    s = mk_state(P1, cells, (2, 3), 2)  # face west to the red key
    out = run(P1, s, [C.PICKUP, C.RIGHT, C.RIGHT, C.TOGGLE])
    assert cell_of(P1, out[3][0], 3, 3)[2] == C.DOOR_LOCKED
    # matching key opens (and the key is kept — minigrid lineage)
    cells[(1, 3)] = (C.KEY, blue, 0)
    s = mk_state(P1, cells, (2, 3), 2)
    out = run(P1, s, [C.PICKUP, C.RIGHT, C.RIGHT, C.TOGGLE])
    s4 = out[3][0]
    assert cell_of(P1, s4, 3, 3)[2] == C.DOOR_OPEN
    assert int(s4.carry_type[0]) == C.KEY
