"""L0 rendering-primitive tests (SURVEY §2.1 rendering.py inventory).

Pin the geometric predicates, rasterizer, LUT builders, and board render —
the pieces PARITY.md maps to ``marlgrid/rendering.py``.
"""
import numpy as np

from marlgrid_tpu import rendering as R
from marlgrid_tpu.core import constants as C
from marlgrid_tpu.core.state import EnvParams, default_agent_colors


def test_point_predicates():
    rect = R.point_in_rect(0.2, 0.8, 0.3, 0.7)
    assert rect(0.5, 0.5) and not rect(0.1, 0.5) and not rect(0.5, 0.9)
    circ = R.point_in_circle(0.5, 0.5, 0.2)
    assert circ(0.5, 0.6) and not circ(0.5, 0.75)
    tri = R.point_in_triangle((0.1, 0.1), (0.9, 0.1), (0.5, 0.9))
    assert tri(0.5, 0.3) and not tri(0.05, 0.9)
    line = R.point_in_line(0.1, 0.1, 0.9, 0.9, r=0.05)
    assert line(0.5, 0.5) and not line(0.9, 0.1)


def test_rotate_fn_quarter_turn():
    # a predicate true only near the top edge, rotated 90° -> right edge
    top = R.point_in_rect(0.0, 1.0, 0.0, 0.2)
    rot = R.rotate_fn(top, cx=0.5, cy=0.5, theta=np.pi / 2)
    assert top(0.5, 0.1) and not top(0.9, 0.5)
    assert rot(0.1, 0.5) or rot(0.9, 0.5)  # moved to a side edge
    assert not rot(0.5, 0.5)


def test_fill_coords_and_downsample():
    img = np.zeros((32, 32, 3), np.uint8)
    R.fill_coords(img, R.point_in_rect(0, 0.5, 0, 1.0), (255, 0, 0))
    assert img[:, :, 0].sum() > 0 and img[:, :, 1].sum() == 0
    small = R.downsample(img, 4)
    assert small.shape == (8, 8, 3)
    # left half red, right half black (x = first axis in tile space)
    assert small[1, 1, 0] > 200 and small[7, 7, 0] < 50


def test_highlight_img_blends():
    img = np.zeros((8, 8, 3), np.uint8)
    out = R.highlight_img(img.copy(), color=(255, 255, 255), alpha=0.5)
    assert out.mean() > img.mean()


def test_luts_shapes_and_distinct():
    T = 8
    base = R.base_lut(T)
    agent = R.agent_lut(T)
    from marlgrid_tpu.core import obs as O
    assert base.shape == (O.N_BASE_APPEAR, T, T, 3) and base.dtype == np.uint8
    assert agent.shape == (O.N_AGENT_APPEAR, T, T, 4)
    def row(t, c, s=0):
        return base[(t * C.N_COLORS + c) * O.NS + s]
    assert not np.array_equal(row(C.WALL, 7), row(C.GOAL, 3))
    assert not np.array_equal(row(C.DOOR, 0, C.DOOR_OPEN),
                              row(C.DOOR, 0, C.DOOR_LOCKED))
    # agent overlay row 0 is "no agent" (fully transparent alpha)
    assert agent[0, :, :, 3].max() == 0
    assert agent[1, :, :, 3].max() > 0


def test_render_board_shape():
    import jax
    from marlgrid_tpu.core import grid_gen
    p = EnvParams(width=9, height=9, n_agents=2, scenario="empty",
                  max_steps=10, view_size=5, observation_style="encode",
                  agent_colors=default_agent_colors(2))
    st = grid_gen.reset(p, jax.random.PRNGKey(0))
    img = R.render_board(p, st, tile_size=8)
    assert img.shape == (9 * 8, 9 * 8, 3) and img.dtype == np.uint8
    assert img.max() > 0
