"""Pallas sprite-composite kernel vs the XLA full-LUT image path.

The kernel (ops/sprite.py) must be BIT-IDENTICAL to the fallback one-hot
GEMM formulation (core/obs.py::all_obs_image_b force_xla=True) — same
sprites, same occlusion blackout, same agent overlay and prestige dimming,
same uint8 truncation. Runs the kernel in Pallas interpret mode so the
comparison works on the CPU test harness.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlgrid_tpu import rendering
from marlgrid_tpu.core import grid_gen, obs as obs_mod, step as step_mod
from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.ops import sprite

CONFIGS = [
    dict(width=9, height=9, n_agents=1, scenario="empty", view_size=5),
    dict(width=15, height=15, n_agents=3, scenario="cluttered", n_clutter=25),
    dict(width=11, height=11, n_agents=2, scenario="doorkey"),
    dict(width=13, height=13, n_agents=4, scenario="goal_cycle",
         n_bonus_tiles=3),
]


def _rollout_states(params, B, T, seed):
    """A batch of states after T random steps (exercises doors/pickups)."""
    key = jax.random.PRNGKey(seed)
    state = jax.vmap(lambda k: grid_gen.reset(params, k))(
        jax.random.split(key, B))
    step = jax.jit(jax.vmap(lambda s, a: step_mod.step(params, s, a)[0]))
    rng = np.random.default_rng(seed)
    for _ in range(T):
        state = step(state, jnp.asarray(
            rng.integers(0, 7, (B, params.n_agents)), jnp.int32))
    return state


@pytest.mark.parametrize("cfg", CONFIGS,
                         ids=[c["scenario"] for c in CONFIGS])
def test_sprite_kernel_matches_xla_path(cfg):
    params = EnvParams(observation_style="image", max_steps=100,
                       agent_colors=default_agent_colors(cfg["n_agents"]),
                       **cfg)
    assert sprite.base_palette(params) is not None
    B = 16 if (16 * params.n_agents) % 16 == 0 else 16
    state = _rollout_states(params, B, 6, seed=3)
    # force some prestige so dim levels differ across agents
    state.prestige = jnp.asarray(
        np.random.default_rng(0).uniform(0, 12, (B, params.n_agents)),
        jnp.float32)
    bl = jnp.asarray(rendering.base_lut(params.view_tile_size))
    al = jnp.asarray(rendering.agent_lut(params.view_tile_size))
    ref = obs_mod.all_obs_image_b(params, state, bl, al, force_xla=True)
    got = obs_mod.all_obs_image_b(params, state, bl, al,
                                  sprite_interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # TPU-native (N, B, ...) layout is the same image, agent-major
    got_nb = obs_mod.all_obs_image_b(params, state, bl, al,
                                     sprite_interpret=True, bminor=True)
    np.testing.assert_array_equal(
        np.asarray(got_nb), np.asarray(ref).transpose(1, 0, 2, 3, 4))


def test_sprite_kernel_hidden_types_and_offset():
    params = EnvParams(width=11, height=11, n_agents=2, scenario="doorkey",
                       observation_style="image", view_offset=1,
                       hide_item_types=(4,),   # hide keys
                       agent_colors=default_agent_colors(2))
    state = _rollout_states(params, 16, 4, seed=9)
    bl = jnp.asarray(rendering.base_lut(params.view_tile_size))
    al = jnp.asarray(rendering.agent_lut(params.view_tile_size))
    ref = obs_mod.all_obs_image_b(params, state, bl, al, force_xla=True)
    got = obs_mod.all_obs_image_b(params, state, bl, al,
                                  sprite_interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_palette_availability_gates():
    params = EnvParams(width=9, height=9, n_agents=1, scenario="empty",
                       observation_style="image",
                       agent_colors=default_agent_colors(1))
    # palette known for builtins; unknown scenario -> None (falls back)
    assert sprite.base_palette(params) is not None
    grid_gen.SCENARIOS.setdefault("nopalette", grid_gen.gen_empty)
    grid_gen._N_EVENTS.setdefault("nopalette", lambda p: 1)
    p2 = params.replace(scenario="nopalette")
    assert sprite.base_palette(p2) is None


def test_custom_scenario_palette_hook():
    """register_scenario(palette=...) opts a custom scenario into the
    sprite kernel; the kernel must match the XLA path there too."""
    import marlgrid_tpu.objects as O

    def _engine(params, layers, split_x, door_y):
        return layers, [O.Lava() for _ in range(4)] + [O.Goal()], None

    grid_gen.register_scenario(
        "lavafield_pal", _engine, 5,
        palette=[(8, 1, 0), (7, 3, 0)])   # orange lava, green goal
    params = EnvParams(width=11, height=11, n_agents=2,
                       scenario="lavafield_pal", observation_style="image",
                       agent_colors=default_agent_colors(2))
    assert sprite.base_palette(params) is not None
    state = _rollout_states(params, 16, 4, seed=5)
    import jax.numpy as jnp

    from marlgrid_tpu import rendering
    bl = jnp.asarray(rendering.base_lut(params.view_tile_size))
    al = jnp.asarray(rendering.agent_lut(params.view_tile_size))
    ref = obs_mod.all_obs_image_b(params, state, bl, al, force_xla=True)
    got = obs_mod.all_obs_image_b(params, state, bl, al,
                                  sprite_interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_bminor_layout_consistent_on_fallback():
    """bminor=True returns (N, B, ...) on BOTH the kernel and XLA paths."""
    params = EnvParams(width=9, height=9, n_agents=2, scenario="empty",
                       observation_style="image",
                       agent_colors=default_agent_colors(2))
    state = _rollout_states(params, 8, 2, seed=1)
    bl = jnp.asarray(rendering.base_lut(params.view_tile_size))
    al = jnp.asarray(rendering.agent_lut(params.view_tile_size))
    xla_nb = obs_mod.all_obs_image_b(params, state, bl, al, force_xla=True,
                                     bminor=True)
    ker_nb = obs_mod.all_obs_image_b(params, state, bl, al,
                                     sprite_interpret=True, bminor=True)
    assert xla_nb.shape[0] == 2 and xla_nb.shape[1] == 8
    np.testing.assert_array_equal(np.asarray(ker_nb), np.asarray(xla_nb))
    # odd batch (not divisible by 16) works in interpret mode (bc fallback)
    state9 = _rollout_states(params, 9, 1, seed=2)
    got = obs_mod.all_obs_image_b(params, state9, bl, al,
                                  sprite_interpret=True)
    ref = obs_mod.all_obs_image_b(params, state9, bl, al, force_xla=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_s2d_layout_matches_permuted_image():
    """The sprite kernel's space-to-depth output (free RHS column
    relabeling) must equal the block-4 permutation of the standard
    image, bit for bit — on both the kernel (interpret) and XLA paths."""
    import jax

    from marlgrid_tpu.core import grid_gen, obs as obs_mod
    from marlgrid_tpu.core.state import EnvParams, default_agent_colors
    from marlgrid_tpu import rendering

    p = EnvParams(width=11, height=11, n_agents=2, scenario="cluttered",
                  n_clutter=6, max_steps=20, view_size=7, view_tile_size=8,
                  observation_style="image",
                  agent_colors=default_agent_colors(2))
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    state = jax.vmap(lambda k: grid_gen.reset(p, k))(keys)
    luts = (jnp.asarray(rendering.base_lut(8)),
            jnp.asarray(rendering.agent_lut(8)))
    for interp, force in ((True, False), (False, True)):
        std = obs_mod.all_obs_image_b(p, state, *luts, force_xla=force,
                                      sprite_interpret=interp)
        s2d = obs_mod.all_obs_image_b(p, state, *luts, force_xla=force,
                                      sprite_interpret=interp, s2d=True)
        side = 56 // 4
        ref = np.asarray(std).reshape(B, 2, side, 4, side, 4, 3) \
            .transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, 2, side, side, 48)
        np.testing.assert_array_equal(np.asarray(s2d), ref)


def test_sprite_kernel_observer_subset_parity_tpu():
    """OPT-IN on real TPU (MARLGRID_TPU_GATE=1): the Pallas sprite path
    with ``observers=`` (N from the id shapes, round 5 mixed-style hetero)
    is bit-exact vs slicing the full-N kernel render. The CPU suite covers
    the XLA fallback (tests/test_hetero_obs.py); this covers the kernel."""
    import os
    import subprocess
    import sys

    if not os.environ.get("MARLGRID_TPU_GATE"):
        import pytest

        pytest.skip("TPU-only: set MARLGRID_TPU_GATE=1 on a TPU host")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    code = r"""
import jax, jax.numpy as jnp, numpy as np
from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.core import obs as obs_mod, step as step_mod
from marlgrid_tpu.parallel.ppo import init_env_batch
from marlgrid_tpu import rendering
from marlgrid_tpu.vector import obs_groups
from marlgrid_tpu.ops import sprite

ep = EnvParams(width=13, height=13, n_agents=4, scenario="goal_cycle",
               n_bonus_tiles=3, max_steps=50, view_size=7,
               observation_style="image", agent_view_sizes=(7, 5, 7, 5),
               agent_colors=default_agent_colors(4))
state = init_env_batch(ep, 256, jax.random.PRNGKey(0))
key = jax.random.PRNGKey(1)
for t in range(5):
    key, ak = jax.random.split(key)
    acts = jax.random.randint(ak, (256, 4), 0, 7)
    state, _, _, _ = step_mod.step_autoreset_with_fresh_batch(
        ep, state, acts, step_mod.fresh_pool_tiled(ep, key, 1, 256), salt=t)
packed = obs_mod.pack_grid_with_agents(ep, state, with_lvl=True)
for g, (idxs, gp) in enumerate(obs_groups(ep)):
    luts = (jnp.asarray(rendering.base_lut(gp.view_tile_size)),
            jnp.asarray(rendering.agent_lut(gp.view_tile_size)))
    assert sprite.available(gp, 256), "kernel path not active"
    full = obs_mod.all_obs_image_b(gp, state, *luts)
    sub = obs_mod.all_obs_image_b(gp, state, *luts, observers=idxs,
                                  packed=packed)
    np.testing.assert_array_equal(
        np.asarray(sub), np.asarray(full[:, np.asarray(idxs)]))
print("OK")
"""
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0 and "OK" in out.stdout, \
        out.stdout + out.stderr
