"""Occlusion-mask equivalence: engine's row-vectorized sweep vs the oracle's
literal minigrid nested-loop flood, over random transparency grids
(SURVEY §7.3 item 4 — replicate sweep-for-sweep, not from intuition)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlgrid_tpu.core import obs as obs_mod
from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.oracle import OracleEnv


@pytest.mark.parametrize("vs,offset", [(5, 0), (7, 0), (7, 1), (9, 0)])
def test_process_vis_equivalence(vs, offset):
    params = EnvParams(view_size=vs, view_offset=offset,
                       agent_colors=default_agent_colors(1))
    oracle = OracleEnv(params)

    n = 200
    rng = np.random.default_rng(vs * 10 + offset)
    grids = rng.random((n, vs, vs)) < 0.7  # ~30% blocking cells

    engine = jax.jit(jax.vmap(
        lambda t: obs_mod.process_vis(t, vs, offset)))
    got = np.asarray(engine(jnp.asarray(grids)))
    for k in range(n):
        want = oracle.process_vis(grids[k])
        np.testing.assert_array_equal(got[k], want, err_msg=f"grid {k}")


def test_agent_cell_always_visible():
    vs = 7
    params = EnvParams(view_size=vs, agent_colors=default_agent_colors(1))
    t = jnp.zeros((vs, vs), bool)  # fully opaque world
    m = np.asarray(obs_mod.process_vis(t, vs, 0))
    assert m[vs // 2, vs - 1]
    assert m.sum() >= 1
