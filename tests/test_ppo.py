"""PPO learner stack tests (BASELINE config #5 plumbing) on the virtual
CPU mesh — small shapes, one compile each."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.parallel import ppo
from marlgrid_tpu.parallel.mesh import make_mesh

EP = EnvParams(width=9, height=9, n_agents=2, scenario="empty", max_steps=20,
               view_size=5, observation_style="encode",
               agent_colors=default_agent_colors(2))
CFG = ppo.PPOConfig(n_envs=8, rollout_len=8, n_epochs=1, n_minibatches=2)


def _run_steps(mesh, n_steps=2):
    key = jax.random.PRNGKey(0)
    net, params, tx, opt_state = ppo.init_state(EP, CFG, key)
    env_state = ppo.init_env_batch(EP, CFG.n_envs, jax.random.fold_in(key, 1),
                                   mesh)
    step = ppo.make_train_step(EP, CFG, net, tx, mesh=mesh)
    ms = []
    for _ in range(n_steps):
        params, opt_state, env_state, key, m = step(params, opt_state,
                                                    env_state, key)
        ms.append({k: float(v) for k, v in m.items()})
    return params, ms


def test_train_step_runs_and_is_finite():
    _, ms = _run_steps(mesh=None)
    for m in ms:
        assert np.isfinite(m["loss"])
        assert np.isfinite(m["entropy"]) and m["entropy"] > 0
        assert m["n_episodes"] >= 0


def test_train_step_sharded(devices8):
    mesh = make_mesh(n_data=4, n_model=2, devices=devices8)
    _, ms = _run_steps(mesh=mesh)
    assert np.isfinite(ms[-1]["loss"])


def test_minibatch_remainder_warns():
    """Blocks that don't divide into n_minibatches are dropped AUDIBLY
    (no-silent-caps; VERDICT r3 weak #5)."""
    cfg = ppo.PPOConfig(n_envs=8, rollout_len=8, n_epochs=1,
                        n_minibatches=3)   # G=16 blocks, 16 % 3 != 0
    key = jax.random.PRNGKey(0)
    net, params, tx, opt_state = ppo.init_state(EP, cfg, key)
    env_state = ppo.init_env_batch(EP, cfg.n_envs,
                                   jax.random.fold_in(key, 1), None)
    step = ppo.make_train_step(EP, cfg, net, tx)
    with pytest.warns(UserWarning, match="dropping"):
        step(params, opt_state, env_state, key)


def test_network_output_shapes():
    net, params, _, _ = ppo.init_state(EP, CFG, jax.random.PRNGKey(0))
    obs = jnp.zeros((4, 2, 5, 5, 3), jnp.int32)
    logits, value = net.apply(params, obs)
    assert logits.shape == (4, 2, 7)
    assert value.shape == (4, 2)
    assert logits.dtype == jnp.float32


def test_gae_matches_reference_impl():
    T, B = 5, 3
    rng = np.random.default_rng(0)
    rew = rng.normal(size=(T, B)).astype(np.float32)
    val = rng.normal(size=(T, B)).astype(np.float32)
    done = rng.random((T, B)) < 0.3
    last = rng.normal(size=(B,)).astype(np.float32)
    gamma, lam = 0.99, 0.95
    adv, ret = jax.jit(lambda *a: ppo._gae(*a, gamma, lam))(
        jnp.asarray(rew), jnp.asarray(val), jnp.asarray(done),
        jnp.asarray(last))
    # reference: plain backward python loop
    exp = np.zeros((T, B), np.float32)
    gae = np.zeros(B, np.float32)
    next_v = last.copy()
    for t in reversed(range(T)):
        nonterm = 1.0 - done[t]
        delta = rew[t] + gamma * next_v * nonterm - val[t]
        gae = delta + gamma * lam * nonterm * gae
        exp[t] = gae
        next_v = val[t]
    np.testing.assert_allclose(np.asarray(adv), exp, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), exp + val, atol=1e-5)


@pytest.mark.slow
def test_learning_signal():
    """A few iterations on a trivial task should increase episode return."""
    ep = EnvParams(width=7, height=7, n_agents=1, scenario="empty",
                   max_steps=12, view_size=5, observation_style="encode",
                   agent_colors=default_agent_colors(1))
    cfg = ppo.PPOConfig(n_envs=64, rollout_len=24, n_epochs=2,
                        n_minibatches=2, lr=1e-3, ent_coef=0.003)
    key = jax.random.PRNGKey(1)
    net, params, tx, opt_state = ppo.init_state(ep, cfg, key)
    env_state = ppo.init_env_batch(ep, cfg.n_envs, jax.random.fold_in(key, 1))
    step = ppo.make_train_step(ep, cfg, net, tx)
    rets = []
    for it in range(30):
        params, opt_state, env_state, key, m = step(params, opt_state,
                                                    env_state, key)
        rets.append(float(m["episode_return"]))
    early = np.mean(rets[2:8])
    late = np.mean(rets[-6:])
    assert late > early + 0.05, f"no learning: early={early:.3f} late={late:.3f}"


def test_feature_major_apply_matches_row_major():
    """OneHotEmbed feature_major (samples on lanes, features contracted
    in place) computes the SAME function as the row-major apply — the
    encode PPO path relies on this to skip every uint8 store relayout."""
    cfg = ppo.PPOConfig(hidden=16, dtype=jnp.float32)
    from marlgrid_tpu.models import ActorCritic

    net = ActorCritic(cfg)
    rng = np.random.default_rng(0)
    vs = 5
    obs = jnp.asarray(rng.integers(0, 12, size=(6, vs, vs, 3)), jnp.int32)
    params = net.init(jax.random.PRNGKey(0), obs[:1])
    lg_row, v_row = net.apply(params, obs)                   # (6, A), (6,)
    # feature-major layout: (F, S) with F ordered (channel, vi, vj)
    fm = obs.transpose(3, 1, 2, 0).reshape(3 * vs * vs, 6)
    lg_fm, v_fm = net.apply(params, fm, feature_major=True)  # (6, A), (6,)
    np.testing.assert_allclose(np.asarray(lg_fm), np.asarray(lg_row),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_fm), np.asarray(v_row),
                               rtol=1e-5, atol=1e-5)


def test_ratio_dev_row_alignment_feature_major():
    """First-minibatch |ratio-1| stays ~0: stored logp recomputed from the
    feature-major-stored obs at unchanged params must agree — drift means
    trajectory rows got mispaired in the block plumbing."""
    ep = EP
    cfg = ppo.PPOConfig(n_envs=8, rollout_len=8, n_epochs=1,
                        n_minibatches=1, lr=0.0, dtype=jnp.float32)
    key = jax.random.PRNGKey(3)
    net, params, tx, opt_state = ppo.init_state(ep, cfg, key)
    env_state = ppo.init_env_batch(ep, cfg.n_envs, jax.random.fold_in(key, 1))
    step = ppo.make_train_step(ep, cfg, net, tx)
    _, _, _, _, m = step(params, opt_state, env_state, key)
    assert float(m["ratio_dev"]) < 1e-4, float(m["ratio_dev"])


def _image_ep(n_agents=2):
    return EnvParams(width=9, height=9, n_agents=n_agents,
                     scenario="cluttered", n_clutter=4, max_steps=12,
                     view_size=5, view_tile_size=4,
                     observation_style="image",
                     agent_colors=default_agent_colors(n_agents))


def test_image_recompute_matches_stored_images():
    """Re-rendering minibatch obs from stored EnvStates computes the same
    update math as the stored-image-buffer path: with lr=0, one epoch, one
    full-batch minibatch, losses agree and ratio_dev ~ 0 (row alignment
    between re-rendered obs and stored action/logp labels)."""
    ep = _image_ep()
    key = jax.random.PRNGKey(0)
    ms = {}
    for rec in (True, False):
        cfg = ppo.PPOConfig(n_envs=8, rollout_len=4, n_epochs=1,
                            n_minibatches=1, lr=0.0, hidden=16,
                            torso="cnn_image", dtype=jnp.float32,
                            recompute_image_obs=rec)
        net, params, tx, opt_state = ppo.init_state(ep, cfg, key)
        env_state = ppo.init_env_batch(ep, cfg.n_envs,
                                       jax.random.fold_in(key, 1))
        step = ppo.make_train_step(ep, cfg, net, tx)
        _, _, _, _, m = step(params, opt_state, env_state, key)
        ms[rec] = {k: float(v) for k, v in m.items()}
    assert ms[True]["ratio_dev"] < 1e-4, ms[True]["ratio_dev"]
    np.testing.assert_allclose(ms[True]["loss"], ms[False]["loss"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ms[True]["pg_loss"], ms[False]["pg_loss"],
                               rtol=1e-3, atol=1e-5)


def test_image_recompute_learns_finite():
    """Multi-epoch/minibatch smoke on the recompute path (gradients flow,
    episode metrics populated)."""
    ep = _image_ep()
    cfg = ppo.PPOConfig(n_envs=8, rollout_len=16, n_epochs=2,
                        n_minibatches=2, hidden=16, torso="cnn_image",
                        recompute_image_obs=True)
    key = jax.random.PRNGKey(1)
    net, params, tx, opt_state = ppo.init_state(ep, cfg, key)
    env_state = ppo.init_env_batch(ep, cfg.n_envs, jax.random.fold_in(key, 1))
    step = ppo.make_train_step(ep, cfg, net, tx)
    for _ in range(2):
        params, opt_state, env_state, key, m = step(
            params, opt_state, env_state, key)
    assert np.isfinite(float(m["loss"]))
    assert float(m["n_episodes"]) > 0


def test_overlap_step_runs_and_aligns():
    """Double-buffered overlap variant: priming rollout + overlapped
    iterations produce finite metrics; at lr=0 the stale trajectory's
    recomputed log-probs still align (params unchanged => ratio ~ 1)."""
    cfg = ppo.PPOConfig(n_envs=8, rollout_len=8, n_epochs=1,
                        n_minibatches=1, lr=0.0, dtype=jnp.float32)
    key = jax.random.PRNGKey(5)
    net, params, tx, opt_state = ppo.init_state(EP, cfg, key)
    env_state = ppo.init_env_batch(EP, cfg.n_envs, jax.random.fold_in(key, 1))
    step, prime = ppo.make_train_step(EP, cfg, net, tx, overlap=True)
    env_state, prev, key = prime(params, env_state, key)
    for _ in range(2):
        params, opt_state, env_state, prev, key, m = step(
            params, opt_state, env_state, prev, key)
    assert np.isfinite(float(m["loss"]))
    assert float(m["ratio_dev"]) < 1e-4, float(m["ratio_dev"])


def test_image_s2d_torso_trains():
    """cnn_s2d consumes the sprite kernel's space-to-depth layout
    end-to-end (rollout + recompute update); finite loss, rows aligned."""
    ep = _image_ep()
    cfg = ppo.PPOConfig(n_envs=8, rollout_len=8, n_epochs=1,
                        n_minibatches=1, lr=0.0, hidden=16,
                        torso="cnn_s2d", dtype=jnp.float32)
    key = jax.random.PRNGKey(2)
    net, params, tx, opt_state = ppo.init_state(ep, cfg, key)
    env_state = ppo.init_env_batch(ep, cfg.n_envs, jax.random.fold_in(key, 1))
    step = ppo.make_train_step(ep, cfg, net, tx)
    _, _, _, _, m = step(params, opt_state, env_state, key)
    assert np.isfinite(float(m["loss"]))
    assert float(m["ratio_dev"]) < 1e-4, float(m["ratio_dev"])


def test_rich_obs_ppo_aligns_and_trains():
    """'rich' obs PPO: rendered pov + observe_* aux features read off the
    stored EnvStates in the recompute update. At lr=0 with one full-batch
    minibatch, ratio_dev ~ 0 proves the re-rendered pov AND the
    re-extracted aux vector align row-for-row with the stored
    action/logp labels."""
    ep = _image_ep(2).replace(observation_style="rich",
                              observe_rewards=True, observe_position=True,
                              observe_orientation=True)
    cfg = ppo.PPOConfig(n_envs=8, rollout_len=4, n_epochs=1,
                        n_minibatches=1, lr=0.0, hidden=16,
                        torso="cnn_image", dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    net, params, tx, opt_state = ppo.init_state(ep, cfg, key)
    env_state = ppo.init_env_batch(ep, cfg.n_envs, jax.random.fold_in(key, 1))
    step = ppo.make_train_step(ep, cfg, net, tx)
    _, _, _, _, m = step(params, opt_state, env_state, key)
    assert np.isfinite(float(m["loss"]))
    assert float(m["ratio_dev"]) < 1e-4, float(m["ratio_dev"])
    # and gradients flow with real lr across epochs/minibatches
    cfg2 = ppo.PPOConfig(n_envs=8, rollout_len=8, n_epochs=2,
                         n_minibatches=2, hidden=16, torso="cnn_image")
    net2, params2, tx2, opt2 = ppo.init_state(ep, cfg2, key)
    env2 = ppo.init_env_batch(ep, cfg2.n_envs, jax.random.fold_in(key, 2))
    step2 = ppo.make_train_step(ep, cfg2, net2, tx2)
    for _ in range(2):
        params2, opt2, env2, key, m2 = step2(params2, opt2, env2, key)
    assert np.isfinite(float(m2["loss"]))


def test_rich_aux_features():
    """rich_aux extracts learner-normalized observe_* fields."""
    ep = _image_ep(2).replace(observation_style="rich",
                              observe_rewards=True, observe_position=True,
                              observe_orientation=True)
    assert ppo.aux_dim(ep) == 1 + 2 + 4
    env_state = ppo.init_env_batch(ep, 4, jax.random.PRNGKey(0))
    aux = ppo.rich_aux(ep, env_state)
    assert aux.shape == (4, 2, 7)
    a = np.asarray(aux)
    assert (a[..., 1:3] >= 0).all() and (a[..., 1:3] <= 1).all()  # position
    np.testing.assert_allclose(a[..., 3:].sum(-1), 1.0)           # dir 1-hot
    ep0 = ep.replace(observe_rewards=False, observe_position=False,
                     observe_orientation=False)
    assert ppo.rich_aux(ep0, env_state) is None


def test_multi_step_matches_repeated_single_steps():
    """steps-per-call fusion is pure control flow: K fused iterations must
    equal K separate dispatches bit-for-bit (same key threading)."""
    cfg = ppo.PPOConfig(n_envs=8, rollout_len=4, n_epochs=1,
                        n_minibatches=2, dtype=jnp.float32)
    key = jax.random.PRNGKey(7)
    net, params, tx, opt_state = ppo.init_state(EP, cfg, key)
    env_state = ppo.init_env_batch(EP, cfg.n_envs, jax.random.fold_in(key, 1))

    def copy(t):
        return jax.tree.map(jnp.copy, t)

    # both paths donate their inputs -> each gets its own copy
    single = ppo.make_train_step(EP, cfg, net, tx)
    p1, o1, e1, k1 = copy((params, opt_state, env_state, key))
    for _ in range(3):
        p1, o1, e1, k1, m1 = single(p1, o1, e1, k1)

    multi = ppo.multi_step(ppo.make_train_step(EP, cfg, net, tx, jit=False), 3)
    p3, o3, e3, k3, m3 = multi(*copy((params, opt_state, env_state, key)))

    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), p1, p3)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k3))
    assert float(m1["loss"]) == float(m3["loss"])
