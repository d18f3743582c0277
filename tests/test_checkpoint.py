"""Checkpoint / exact-resume tests (SURVEY §5 checkpoint row): the whole
system state is a pytree of arrays, so resume is bit-exact by construction."""
import jax
import jax.numpy as jnp
import numpy as np

from marlgrid_tpu.core import grid_gen, step as step_mod
from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.utils import checkpoint as ck

EP = EnvParams(width=9, height=9, n_agents=2, scenario="cluttered",
               n_clutter=6, max_steps=30, view_size=5,
               observation_style="encode",
               agent_colors=default_agent_colors(2))


def test_env_state_roundtrip(tmp_path):
    state = jax.jit(lambda k: grid_gen.reset(EP, k))(jax.random.PRNGKey(0))
    tree = jax.device_get(state)
    ck.save(str(tmp_path / "ck"), tree, step=3)
    restored = ck.restore(str(tmp_path / "ck"), tree)
    jax.tree.map(np.testing.assert_array_equal, tree, restored)


def test_exact_resume_trajectory(tmp_path):
    """Stepping from a restored state reproduces the original trajectory
    bit-for-bit."""
    step_fn = jax.jit(lambda s, a: step_mod.step(EP, s, a))
    a = jnp.asarray([2, 2], jnp.int32)
    state = jax.jit(lambda k: grid_gen.reset(EP, k))(jax.random.PRNGKey(7))
    for _ in range(5):
        state, _, _ = step_fn(state, a)
    ck.save(str(tmp_path / "ck"), jax.device_get(state))

    cont, conts = state, []
    for _ in range(5):
        cont, rew, done = step_fn(cont, a)
        conts.append((jax.device_get(cont), np.asarray(rew)))

    resumed = ck.restore(str(tmp_path / "ck"), jax.device_get(state))
    resumed = jax.tree.map(jnp.asarray, resumed)
    # dataclass pytree restore comes back as the same structure
    for t in range(5):
        resumed, rew, done = step_fn(resumed, a)
        want_state, want_rew = conts[t]
        jax.tree.map(np.testing.assert_array_equal, jax.device_get(resumed),
                     want_state)
        np.testing.assert_array_equal(np.asarray(rew), want_rew)
