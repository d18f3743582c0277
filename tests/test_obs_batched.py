"""Batched (batch-minor) obs path vs vmapped per-env path — bit-exact.

The TPU-native obs pipeline has two implementations: the per-env functions
in core/obs.py (vmap-friendly, used by host wrappers and the oracle parity
suite) and the explicitly-batched batch-minor functions (`all_agent_obs_b`)
used on hot paths. They must agree bit-for-bit on every observation style
and layout (SURVEY §4 item 4 — observation golden tests).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlgrid_tpu import rendering
from marlgrid_tpu.core import grid_gen, obs as O, step as S
from marlgrid_tpu.core.state import EnvParams, default_agent_colors


def _params(style, **kw):
    base = dict(width=15, height=15, n_agents=3, scenario="cluttered",
                n_clutter=25, max_steps=100, view_size=7,
                observation_style=style,
                agent_colors=default_agent_colors(3))
    base.update(kw)
    return EnvParams(**base)


def _rollout_states(p, B=32, steps=5, seed=3):
    st = jax.vmap(lambda k: grid_gen.reset(p, k))(
        jax.random.split(jax.random.PRNGKey(seed), B))
    k = jax.random.PRNGKey(seed + 1)
    step = jax.jit(jax.vmap(lambda s, a: S.step(p, s, a)))
    for _ in range(steps):
        k, ak = jax.random.split(k)
        a = jax.random.randint(ak, (B, p.n_agents), 0, 7)
        st, _, _ = step(st, a)
    return st


@pytest.mark.parametrize("style", ["encode", "image"])
def test_batched_matches_vmapped(style):
    p = _params(style)
    st = _rollout_states(p)
    if style == "encode":
        luts = ()
    else:
        luts = (jnp.asarray(rendering.base_lut(p.view_tile_size)),
                jnp.asarray(rendering.agent_lut(p.view_tile_size)))
    ref = jax.jit(jax.vmap(lambda s: O.all_agent_obs(p, s, *luts)))(st)
    got = jax.jit(lambda s: O.all_agent_obs_b(p, s, *luts))(st)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_bminor_layout_matches():
    p = _params("encode")
    st = _rollout_states(p, seed=11)
    ref = jax.jit(lambda s: O.all_agent_obs_b(p, s))(st)
    bm = jax.jit(lambda s: O.all_agent_obs_b(p, s, bminor=True))(st)
    np.testing.assert_array_equal(
        np.asarray(ref), np.asarray(bm).transpose(4, 1, 2, 3, 0))


def test_batched_matches_vmapped_see_through_and_offset():
    p = _params("encode", see_through_walls=True, view_offset=1,
                ghost_mode=False)
    st = _rollout_states(p, seed=5)
    ref = jax.jit(jax.vmap(lambda s: O.all_agent_obs(p, s)))(st)
    got = jax.jit(lambda s: O.all_agent_obs_b(p, s))(st)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_pallas_transpose_fallback_equals_xla():
    from marlgrid_tpu.ops import transpose_bk
    x = jax.random.randint(jax.random.PRNGKey(0), (64, 37), -5, 99, jnp.int32)
    np.testing.assert_array_equal(np.asarray(transpose_bk(x)),
                                  np.asarray(x).T)


def test_hide_item_types_all_paths_agree():
    """hide_item_types blanks hidden types visually in engine (both obs
    paths) and oracle; occlusion still honors the true cell."""
    from marlgrid_tpu.core import constants as C
    from marlgrid_tpu.oracle import OracleEnv
    p = _params("encode", scenario="doorkey", n_agents=2,
                agent_colors=default_agent_colors(2),
                hide_item_types=(C.KEY, C.DOOR))
    st = _rollout_states(p, B=16, steps=4, seed=2)
    ref = jax.jit(jax.vmap(lambda s: O.all_agent_obs(p, s)))(st)
    got = jax.jit(lambda s: O.all_agent_obs_b(p, s))(st)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    assert not (np.asarray(ref)[..., 0] == C.KEY).any()
    assert not (np.asarray(ref)[..., 0] == C.DOOR).any()

    # oracle agreement on a fresh env (same reset key -> same board)
    oracle = OracleEnv(p)
    o_obs = oracle.reset(jax.random.PRNGKey(7))
    from marlgrid_tpu.core import grid_gen
    st1 = grid_gen.reset(p, jax.random.PRNGKey(7))
    e_obs = np.asarray(jax.jit(lambda s: O.all_agent_obs(p, s))(st1))
    np.testing.assert_array_equal(np.stack(o_obs), e_obs)
