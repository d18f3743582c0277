"""Heterogeneous RECURRENT PPO (parallel/ppo_hetero_rnn.py).

The reference composes per-agent GridAgentInterface configs freely with
recurrent learners (SURVEY §2.1; VERDICT r4 missing #4 — hetero was
feedforward-only through round 4). These tests mirror the feedforward
hetero suite: params-move smoke, the lr=0 row-alignment invariant (stored
sequences, entry carries, and column gathers all line up), and the
train->checkpoint->no-flag-evaluate CLI e2e.
"""
import json

import jax
import numpy as np
import pytest

from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.parallel import evaluate, ppo, ppo_hetero_rnn, train
from marlgrid_tpu.parallel.ppo import init_env_batch

EP = EnvParams(width=9, height=9, n_agents=3, scenario="empty",
               max_steps=10, view_size=5, observation_style="encode",
               agent_view_sizes=(5, 7, 5),
               agent_colors=default_agent_colors(3))


def _cfg(**kw):
    kw.setdefault("n_envs", 8)
    kw.setdefault("rollout_len", 8)
    kw.setdefault("n_epochs", 1)
    kw.setdefault("n_minibatches", 2)
    kw.setdefault("rnn", "gru")
    return ppo.PPOConfig(**kw)


@pytest.mark.parametrize("rnn", ["gru", "lstm"])
def test_hetero_rnn_train_step_runs_params_move(rnn):
    cfg = _cfg(rnn=rnn)
    key = jax.random.PRNGKey(0)
    nets, params, tx, opt_state, h = ppo_hetero_rnn.init_state_hetero_rnn(
        EP, cfg, key)
    assert len(nets) == 2            # (5,), (7,) view-size groups
    env_state = init_env_batch(EP, cfg.n_envs, jax.random.fold_in(key, 1))
    step = ppo_hetero_rnn.make_train_step_hetero_rnn(EP, cfg, nets, tx)
    p0 = jax.tree.map(lambda x: np.asarray(x), params)
    for _ in range(2):
        params, opt_state, env_state, h, key, m = step(
            params, opt_state, env_state, h, key)
    m = {k: float(v) for k, v in m.items()}
    assert np.isfinite(m["loss"]) and m["entropy"] > 0
    moved = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()),
                         params, p0)
    for g in range(2):
        assert max(jax.tree.leaves(moved[g])) > 0.0, f"group {g} frozen"
    # the carry is live training state: some env's hidden must be nonzero
    assert max(float(np.abs(np.asarray(x)).max())
               for x in jax.tree.leaves(h)) > 0.0


def test_hetero_rnn_alignment_lr0():
    """With lr=0 the update's re-run of every stored sequence from its
    entry carry must reproduce the rollout log-probs exactly — obs
    stores, h0 blocking, done masking, and column gathers all line up."""
    cfg = _cfg(lr=0.0)
    key = jax.random.PRNGKey(0)
    nets, params, tx, opt_state, h = ppo_hetero_rnn.init_state_hetero_rnn(
        EP, cfg, key)
    env_state = init_env_batch(EP, cfg.n_envs, jax.random.fold_in(key, 1))
    step = ppo_hetero_rnn.make_train_step_hetero_rnn(EP, cfg, nets, tx)
    # two steps: the second starts from a mid-episode carry (h != 0), so
    # the stored-entry-carry path is exercised for real
    params, opt_state, env_state, h, key, m = step(
        params, opt_state, env_state, h, key)
    _, _, _, _, _, m = step(params, opt_state, env_state, h, key)
    assert float(m["ratio_dev"]) < 1e-4, float(m["ratio_dev"])


def test_hetero_rnn_rejects_bptt_window():
    with pytest.raises(SystemExit, match="bptt"):
        ppo_hetero_rnn.init_state_hetero_rnn(
            EP, _cfg(bptt_window=4), jax.random.PRNGKey(0))


def test_train_cli_hetero_rnn_e2e(tmp_path, capsys):
    """--agent-config + --rnn: trains, checkpoints (self-describing incl.
    the carry), and evaluates with NO flags but the checkpoint."""
    ck = str(tmp_path / "ck")
    spec = json.dumps([{"view_size": 5}, {"view_size": 7}])
    train.main(["--scenario", "empty", "--grid-size", "9",
                "--max-steps", "10", "--view-size", "5", "--obs", "encode",
                "--agent-config", spec, "--rnn", "gru",
                "--envs", "8", "--rollout", "4", "--iters", "2",
                "--epochs", "1", "--minibatches", "2",
                "--checkpoint-dir", ck, "--checkpoint-every", "2"])
    evaluate.main(["--checkpoint", ck, "--episodes", "1"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["episodes"] == 1 and stats["mean_length"] > 0
