"""Recurrent PPO (GRU/LSTM policy family, parallel/ppo_rnn.py) on the
virtual CPU mesh — small shapes, one compile each."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.models import RecurrentActorCritic
from marlgrid_tpu.parallel import ppo, ppo_rnn
from marlgrid_tpu.parallel.mesh import make_mesh

EP = EnvParams(width=9, height=9, n_agents=2, scenario="empty", max_steps=10,
               view_size=5, observation_style="encode",
               agent_colors=default_agent_colors(2))


def _cfg(**kw):
    base = dict(n_envs=8, rollout_len=8, n_epochs=1, n_minibatches=2,
                rnn="gru", hidden=16)
    base.update(kw)
    return ppo.PPOConfig(**base)


def _run_steps(cfg, mesh=None, n_steps=2, seed=0):
    key = jax.random.PRNGKey(seed)
    net, params, tx, opt_state, h = ppo_rnn.init_state_rnn(EP, cfg, key)
    env_state = ppo_rnn.init_env_batch(EP, cfg.n_envs,
                                       jax.random.fold_in(key, 1), mesh)
    step = ppo_rnn.make_train_step_rnn(EP, cfg, net, tx, mesh=mesh)
    ms = []
    for _ in range(n_steps):
        params, opt_state, env_state, h, key, m = step(
            params, opt_state, env_state, h, key)
        ms.append({k: float(v) for k, v in m.items()})
    return params, h, ms


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_train_step_runs_and_is_finite(cell):
    _, h, ms = _run_steps(_cfg(rnn=cell))
    for m in ms:
        assert np.isfinite(m["loss"])
        assert np.isfinite(m["entropy"]) and m["entropy"] > 0
    # max_steps=10 < rollout_len: episodes completed, so the carry was
    # reset at boundaries and episode metrics are populated
    assert ms[-1]["n_episodes"] > 0
    leaves = jax.tree.leaves(h)
    assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in leaves)


def test_train_step_sharded(devices8):
    mesh = make_mesh(n_data=4, n_model=2, devices=devices8)
    _, _, ms = _run_steps(_cfg(), mesh=mesh)
    assert np.isfinite(ms[-1]["loss"])


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_ratio_dev_alignment(cell):
    """The update's sequence re-run from the stored h0 reproduces the
    rollout's hidden states exactly at unchanged params: first-epoch
    |ratio-1| ~ 0. Drift means the blocked sequences, dones, or h0 got
    mispaired — THE correctness invariant of recurrent-PPO plumbing."""
    cfg = _cfg(rnn=cell, lr=0.0, n_minibatches=2, dtype=jnp.float32)
    _, _, ms = _run_steps(cfg, n_steps=1, seed=3)
    assert ms[0]["ratio_dev"] < 1e-4, ms[0]["ratio_dev"]


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_bptt_window_alignment(cell):
    """Truncated BPTT: every window re-runs from ITS stored entry carry —
    at unchanged params the recomputed log-probs equal the stored rollout
    log-probs in EVERY window (forward states are exact; only gradients
    truncate at window boundaries)."""
    for L in (4, 2):
        cfg = _cfg(rnn=cell, lr=0.0, dtype=jnp.float32, bptt_window=L)
        _, _, ms = _run_steps(cfg, n_steps=1, seed=3)
        assert ms[0]["ratio_dev"] < 1e-4, (L, ms[0]["ratio_dev"])


def test_bptt_window_full_equals_default():
    """bptt_window == rollout_len must be bit-identical to the default
    full-sequence update (the W=1 window transforms reduce to the round-3
    blocking)."""
    key = jax.random.PRNGKey(5)
    outs = []
    for bw in (0, 8):
        cfg = _cfg(dtype=jnp.float32, bptt_window=bw)
        net, params, tx, opt_state, h = ppo_rnn.init_state_rnn(EP, cfg, key)
        env_state = ppo_rnn.init_env_batch(EP, cfg.n_envs,
                                           jax.random.fold_in(key, 1))
        step = ppo_rnn.make_train_step_rnn(EP, cfg, net, tx)
        params, opt_state, env_state, h, k, m = step(
            params, opt_state, env_state, h, key)
        outs.append((params, h, {kk: float(v) for kk, v in m.items()}))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), outs[0][0], outs[1][0])
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), outs[0][1], outs[1][1])
    assert outs[0][2]["loss"] == outs[1][2]["loss"]


def test_bptt_window_trains_finite():
    """A windowed (L < T) step trains: finite loss, params move."""
    cfg = _cfg(bptt_window=4)
    params, h, ms = _run_steps(cfg, n_steps=2)
    for m in ms:
        assert np.isfinite(m["loss"]) and m["entropy"] > 0


IMG_EP = EnvParams(width=9, height=9, n_agents=2, scenario="cluttered",
                   n_clutter=4, max_steps=10, view_size=5,
                   view_tile_size=4, observation_style="image",
                   agent_colors=default_agent_colors(2))


def _run_img(cfg, n_steps=2, seed=0):
    key = jax.random.PRNGKey(seed)
    net, params, tx, opt_state, h = ppo_rnn.init_state_rnn(IMG_EP, cfg, key)
    env_state = ppo_rnn.init_env_batch(IMG_EP, cfg.n_envs,
                                       jax.random.fold_in(key, 1))
    step = ppo_rnn.make_train_step_rnn(IMG_EP, cfg, net, tx)
    ms = []
    for _ in range(n_steps):
        params, opt_state, env_state, h, key, m = step(
            params, opt_state, env_state, h, key)
        ms.append({k: float(v) for k, v in m.items()})
    return params, h, ms


def test_rnn_image_train_step_runs():
    """Recurrent PPO on RENDERED obs (the social-learning flagship):
    cnn_s2d torso + GRU + EnvState-store rematerialization, one program."""
    cfg = _cfg(torso="cnn_s2d")
    _, h, ms = _run_img(cfg)
    for m in ms:
        assert np.isfinite(m["loss"]) and m["entropy"] > 0
    assert ms[-1]["n_episodes"] > 0
    assert all(np.isfinite(np.asarray(x, np.float32)).all()
               for x in jax.tree.leaves(h))


@pytest.mark.parametrize("bw", [0, 4])
def test_rnn_image_alignment_lr0(bw):
    """Image-rnn row alignment: re-rendered windows re-run from stored
    carries reproduce the rollout log-probs exactly at unchanged params
    (full-sequence AND truncated windows)."""
    cfg = _cfg(torso="cnn_s2d", lr=0.0, dtype=jnp.float32, bptt_window=bw)
    _, _, ms = _run_img(cfg, n_steps=1, seed=3)
    assert ms[0]["ratio_dev"] < 1e-4, (bw, ms[0]["ratio_dev"])


def test_rnn_rich_trains_and_aligns():
    """'rich' + rnn: pov through the rendered pipeline, observe_* aux
    concatenated after the conv flatten, aux rebuilt from stored states
    in the update — alignment holds at frozen params."""
    ep = IMG_EP.replace(observation_style="rich", observe_rewards=True,
                        observe_position=True, observe_orientation=True)
    cfg = _cfg(torso="cnn_s2d", lr=0.0, dtype=jnp.float32)
    key = jax.random.PRNGKey(3)
    net, params, tx, opt_state, h = ppo_rnn.init_state_rnn(ep, cfg, key)
    env_state = ppo_rnn.init_env_batch(ep, cfg.n_envs,
                                       jax.random.fold_in(key, 1))
    step = ppo_rnn.make_train_step_rnn(ep, cfg, net, tx)
    # the step donates its inputs — keep a copy for the second run below
    env_state2 = jax.tree.map(jnp.copy, env_state)
    *_, m = step(params, opt_state, env_state, h, key)
    assert float(m["ratio_dev"]) < 1e-4, float(m["ratio_dev"])
    # and with a real lr it trains finite
    cfg2 = _cfg(torso="cnn_s2d")
    net2, p2, tx2, o2, h2 = ppo_rnn.init_state_rnn(ep, cfg2, key)
    step2 = ppo_rnn.make_train_step_rnn(ep, cfg2, net2, tx2)
    *_, m2 = step2(p2, o2, env_state2, h2, jax.random.fold_in(key, 2))
    assert np.isfinite(float(m2["loss"])) and float(m2["entropy"]) > 0


def test_train_cli_rnn_rich(tmp_path, capsys):
    """train.py --obs rich --rnn gru end to end + no-args evaluate."""
    from marlgrid_tpu.parallel import evaluate, train

    ck = str(tmp_path / "ck")
    train.main(["--scenario", "cluttered", "--grid-size", "9",
                "--agents", "2", "--envs", "8", "--rollout", "4",
                "--iters", "2", "--max-steps", "10", "--view-size", "5",
                "--obs", "rich", "--observe", "rewards,position",
                "--rnn", "gru", "--epochs", "1",
                "--checkpoint-dir", ck, "--checkpoint-every", "2"])
    evaluate.main(["--checkpoint", ck, "--episodes", "1"])
    import json

    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["episodes"] == 1 and stats["mean_length"] > 0


def test_train_cli_rnn_image(tmp_path, capsys):
    """train.py --obs image --rnn gru end to end + no-args evaluate."""
    from marlgrid_tpu.parallel import evaluate, train

    ck = str(tmp_path / "ck")
    train.main(["--scenario", "cluttered", "--grid-size", "9",
                "--agents", "2", "--envs", "8", "--rollout", "4",
                "--iters", "2", "--max-steps", "10", "--view-size", "5",
                "--obs", "image", "--rnn", "gru", "--epochs", "1",
                "--checkpoint-dir", ck, "--checkpoint-every", "2"])
    evaluate.main(["--checkpoint", ck, "--episodes", "1"])
    import json

    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["episodes"] == 1 and stats["mean_length"] > 0


def test_fused_gru_matches_flax_gru():
    """FusedGRUCell (two gate-fused GEMMs) computes exactly nn.GRUCell's
    update when its fused kernels are split into flax's six per-gate
    tables — same function, fewer MXU ops."""
    import flax.linen as nn
    from marlgrid_tpu.models.actor_critic import FusedGRUCell

    H, B = 16, 8
    fused = FusedGRUCell(H, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, H)),
                    jnp.float32)
    h = jnp.asarray(np.random.default_rng(1).normal(size=(B, H)),
                    jnp.float32)
    fp = fused.init(jax.random.PRNGKey(2), h, x)["params"]
    h_f, _ = fused.apply({"params": fp}, h, x)

    ki, bi = np.asarray(fp["i"]["kernel"]), np.asarray(fp["i"]["bias"])
    kh = np.asarray(fp["h"]["kernel"])
    gp = {
        "ir": {"kernel": ki[:, :H], "bias": bi[:H]},
        "iz": {"kernel": ki[:, H:2 * H], "bias": bi[H:2 * H]},
        "in": {"kernel": ki[:, 2 * H:], "bias": bi[2 * H:]},
        "hr": {"kernel": kh[:, :H]},
        "hz": {"kernel": kh[:, H:2 * H]},
        "hn": {"kernel": kh[:, 2 * H:],
               "bias": np.asarray(fp["hn_bias"])},
    }
    ref = nn.GRUCell(H, dtype=jnp.float32)
    h_r, _ = ref.apply({"params": jax.tree.map(jnp.asarray, gp)}, h, x)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_r),
                               atol=1e-6, rtol=1e-6)


def test_carry_changes_output():
    """The cell actually carries memory: same obs, different carry ->
    different logits (a feedforward regression would pass everything
    else)."""
    cfg = _cfg(dtype=jnp.float32)
    net = RecurrentActorCritic(cfg)
    F = 3 * EP.view_size ** 2
    obs = jnp.zeros((2, F, 4), jnp.int32)
    h0 = net.initial_carry((2, 4))
    params = net.init(jax.random.PRNGKey(0), obs, h0, feature_major=True)
    lg0, _, h1 = net.apply(params, obs, h0, feature_major=True)
    h_alt = jax.tree.map(lambda x: x + 1.0, h0)
    lg1, _, _ = net.apply(params, obs, h_alt, feature_major=True)
    assert not np.allclose(np.asarray(lg0), np.asarray(lg1))
    # and the returned carry evolved from the zero init
    assert any(float(np.abs(np.asarray(x)).max()) > 0
               for x in jax.tree.leaves(h1))


def test_multi_step_matches_repeated_single_steps():
    """steps-per-call fusion is pure control flow for the recurrent
    signature too: K fused iterations == K dispatches bit-for-bit."""
    cfg = _cfg(rollout_len=4, dtype=jnp.float32)
    key = jax.random.PRNGKey(7)
    net, params, tx, opt_state, h = ppo_rnn.init_state_rnn(EP, cfg, key)
    env_state = ppo_rnn.init_env_batch(EP, cfg.n_envs,
                                       jax.random.fold_in(key, 1))

    def copy(t):
        return jax.tree.map(jnp.copy, t)

    single = ppo_rnn.make_train_step_rnn(EP, cfg, net, tx)
    p1, o1, e1, h1, k1 = copy((params, opt_state, env_state, h, key))
    for _ in range(3):
        p1, o1, e1, h1, k1, m1 = single(p1, o1, e1, h1, k1)

    multi = ppo_rnn.multi_step_rnn(
        ppo_rnn.make_train_step_rnn(EP, cfg, net, tx, jit=False), 3)
    p3, o3, e3, h3, k3, m3 = multi(*copy((params, opt_state, env_state,
                                          h, key)))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), p1, p3)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), h1, h3)
    assert float(m1["loss"]) == float(m3["loss"])


def test_train_cli_rnn(tmp_path):
    """train.py --rnn end to end (arg plumbing, h in the loop + ckpt)."""
    from marlgrid_tpu.parallel import train

    train.main(["--scenario", "empty", "--grid-size", "9", "--agents", "2",
                "--envs", "8", "--rollout", "4", "--iters", "2",
                "--max-steps", "10", "--rnn", "gru",
                "--checkpoint-dir", str(tmp_path / "ck"),
                "--checkpoint-every", "2",
                "--metrics", str(tmp_path / "m.jsonl")])
    assert (tmp_path / "m.jsonl").exists()


@pytest.mark.slow
def test_memory_learning_signal():
    """Recurrent PPO learns on a trivial task (returns rise)."""
    ep = EnvParams(width=7, height=7, n_agents=1, scenario="empty",
                   max_steps=12, view_size=5, observation_style="encode",
                   agent_colors=default_agent_colors(1))
    cfg = ppo.PPOConfig(n_envs=64, rollout_len=24, n_epochs=2,
                        n_minibatches=2, lr=1e-3, ent_coef=0.003,
                        rnn="gru", hidden=64)
    key = jax.random.PRNGKey(1)
    net, params, tx, opt_state, h = ppo_rnn.init_state_rnn(ep, cfg, key)
    env_state = ppo_rnn.init_env_batch(ep, cfg.n_envs,
                                       jax.random.fold_in(key, 1))
    step = ppo_rnn.make_train_step_rnn(ep, cfg, net, tx)
    rets = []
    for it in range(30):
        params, opt_state, env_state, h, key, m = step(
            params, opt_state, env_state, h, key)
        rets.append(float(m["episode_return"]))
    early = np.mean(rets[2:8])
    late = np.mean(rets[-6:])
    assert late > early + 0.05, f"no learning: early={early:.3f} late={late:.3f}"


def test_fused_lstm_matches_flax_lstm():
    """FusedLSTMCell (two gate-fused GEMMs over stored (., 4H) kernels)
    computes exactly nn.OptimizedLSTMCell's update when its fused kernels
    are split into flax's eight per-gate blocks — same function, no
    apply-time param concatenation (VERDICT r4 missing #5)."""
    import flax.linen as nn
    from marlgrid_tpu.models.actor_critic import FusedLSTMCell

    H, B = 16, 8
    rng = np.random.default_rng(0)
    fused = FusedLSTMCell(H, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    fp = fused.init(jax.random.PRNGKey(2), (c, h), x)["params"]
    (c_f, h_f), y_f = fused.apply({"params": fp}, (c, h), x)

    ki, bi = np.asarray(fp["i"]["kernel"]), np.asarray(fp["i"]["bias"])
    kh = np.asarray(fp["h"]["kernel"])
    gates = ("i", "f", "g", "o")
    lp = {}
    for j, gname in enumerate(gates):
        sl = slice(j * H, (j + 1) * H)
        lp[f"i{gname}"] = {"kernel": ki[:, sl]}
        # flax puts the per-gate bias on the recurrent Dense; bias
        # placement is additive so carrying ours there is exact
        lp[f"h{gname}"] = {"kernel": kh[:, sl], "bias": bi[sl]}
    ref = nn.OptimizedLSTMCell(H, dtype=jnp.float32)
    (c_r, h_r), y_r = ref.apply(
        {"params": jax.tree.map(jnp.asarray, lp)}, (c, h), x)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_r),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_r),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r),
                               atol=1e-6, rtol=1e-6)
