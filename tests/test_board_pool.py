"""Training-batch board diversity (VERDICT r2 item 1).

The shared-board autoreset gave every env finishing on a step THE one fresh
layout, phase-locking the whole batch onto a single board per episode
generation. These tests pin the K-layout pool + staggered-phase fix: envs
resetting together draw different layouts, assignments rotate over time,
and episode completions stream instead of bursting.
"""
import jax
import jax.numpy as jnp
import numpy as np

from marlgrid_tpu.core import step as step_mod
from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.parallel import ppo


def _params(**kw):
    kw.setdefault("width", 11)
    kw.setdefault("height", 11)
    kw.setdefault("n_agents", 2)
    kw.setdefault("scenario", "cluttered")
    kw.setdefault("n_clutter", 8)
    kw.setdefault("max_steps", 6)
    kw.setdefault("agent_colors", default_agent_colors(kw["n_agents"]))
    return EnvParams(**kw)


def test_fresh_pool_tiled_layouts():
    p = _params()
    B, K = 8, 4
    fresh = step_mod.fresh_pool_tiled(p, jax.random.PRNGKey(0), K, B)
    g = np.asarray(fresh.grid_type)
    # env i carries layout i % K
    for i in range(B):
        assert (g[i] == g[i % K]).all()
    # pool layouts are mutually distinct (cluttered boards, overwhelming
    # probability)
    distinct = {g[i].tobytes() for i in range(K)}
    assert len(distinct) == K


def test_pool_autoreset_diversifies_same_step_resets():
    p = _params(max_steps=3)
    B, K = 8, 4
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    state = jax.vmap(lambda k: step_mod.reset(p, k))(keys)
    fresh = step_mod.fresh_pool_tiled(p, jax.random.PRNGKey(2), K, B)
    acts = jnp.zeros((B, p.n_agents), jnp.int32)  # left turns: nobody moves
    for _ in range(p.max_steps):
        state, rew, done, info = step_mod.step_autoreset_with_fresh_batch(
            p, state, acts, fresh, salt=7)
    assert bool(np.asarray(done).all())          # every env reset this step
    g = np.asarray(state.grid_type)
    assert len({g[i].tobytes() for i in range(B)}) == K  # K layouts, not 1
    # post-reset RNG streams distinct even across envs sharing a layout
    keys = np.asarray(state.key)
    assert len({keys[i].tobytes() for i in range(B)}) == B


def test_rotate_fresh_batch_shifts_assignment():
    p = _params()
    B, K = 8, 4
    fresh = step_mod.fresh_pool_tiled(p, jax.random.PRNGKey(3), K, B)
    rot = step_mod.rotate_fresh_batch(fresh, jnp.int32(1))
    g, gr = np.asarray(fresh.grid_type), np.asarray(rot.grid_type)
    for i in range(B):
        assert (gr[i] == g[(i - 1) % B]).all()


def test_stagger_spreads_episode_completions():
    p = _params(max_steps=8)
    B = 8
    state = ppo.init_env_batch(p, B, jax.random.PRNGKey(4), stagger=True)
    counts = np.asarray(state.step_count)
    assert sorted(counts) == [i * p.max_steps // B for i in range(B)]
    fresh = step_mod.fresh_pool_tiled(p, jax.random.PRNGKey(5), 4, B)
    acts = jnp.zeros((B, p.n_agents), jnp.int32)
    dones_per_step = []
    for t in range(p.max_steps):
        state, rew, done, info = step_mod.step_autoreset_with_fresh_batch(
            p, state, acts, fresh, salt=t)
        dones_per_step.append(int(np.asarray(done).sum()))
    # completions stream (1 per step here), never burst the whole batch
    assert max(dones_per_step) == 1
    assert sum(dones_per_step) == B


def test_ppo_rollout_uses_pool_diversity():
    """End-to-end: after one train_step, the env batch is NOT all on one
    layout (the old shared-board behavior at synchronized resets)."""
    p = _params(max_steps=4, n_agents=2)
    cfg = ppo.PPOConfig(n_envs=8, rollout_len=8, n_epochs=1,
                        n_minibatches=2, hidden=16, board_pool=4)
    key = jax.random.PRNGKey(0)
    net, params, tx, opt_state = ppo.init_state(p, cfg, key)
    env_state = ppo.init_env_batch(p, cfg.n_envs, jax.random.fold_in(key, 1),
                                   stagger=False)  # force synchronized done
    step_fn = ppo.make_train_step(p, cfg, net, tx)
    params, opt_state, env_state, key, metrics = step_fn(
        params, opt_state, env_state, key)
    assert np.isfinite(float(metrics["loss"]))
    g = np.asarray(env_state.grid_type)
    # every env reset at least once during the 8-step rollout (max_steps=4);
    # with a 4-board pool the batch must show >1 distinct layout
    assert len({g[i].tobytes() for i in range(cfg.n_envs)}) > 1
