"""Heterogeneous-agent PPO (parallel/ppo_hetero.py): per-group torsos
trainable from the CLI (VERDICT r3 missing #3; SURVEY §2.1 per-agent
GridAgentInterface configs)."""
import json

import jax
import numpy as np
import pytest

from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.parallel import evaluate, ppo, ppo_hetero, train

EP = EnvParams(width=9, height=9, n_agents=3, scenario="empty",
               max_steps=10, view_size=5, observation_style="encode",
               agent_view_sizes=(5, 7, 5),
               agent_colors=default_agent_colors(3))
CFG = ppo.PPOConfig(n_envs=8, rollout_len=8, n_epochs=1, n_minibatches=2)


def test_hetero_train_step_runs_params_move():
    key = jax.random.PRNGKey(0)
    nets, params, tx, opt_state = ppo_hetero.init_state_hetero(EP, CFG, key)
    assert len(nets) == 2           # (5,), (7,) view-size groups
    env_state = ppo_hetero.init_env_batch(
        EP, CFG.n_envs, jax.random.fold_in(key, 1))
    step = ppo_hetero.make_train_step_hetero(EP, CFG, nets, tx)
    p0 = jax.tree.map(lambda x: np.asarray(x), params)
    for _ in range(2):
        params, opt_state, env_state, key, m = step(params, opt_state,
                                                    env_state, key)
    m = {k: float(v) for k, v in m.items()}
    assert np.isfinite(m["loss"]) and m["entropy"] > 0
    moved = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()),
                         params, p0)
    # BOTH group torsos must have moved
    for g in range(2):
        assert max(jax.tree.leaves(moved[g])) > 0.0, f"group {g} frozen"


def test_hetero_alignment_lr0():
    """With lr=0 (params frozen) the recomputed log-probs must equal the
    stored rollout log-probs — stored group obs, labels, and column
    scatter/gather all line up (the homogeneous paths' ratio_dev
    invariant)."""
    cfg = ppo.PPOConfig(n_envs=8, rollout_len=8, n_epochs=1,
                        n_minibatches=2, lr=0.0)
    key = jax.random.PRNGKey(0)
    nets, params, tx, opt_state = ppo_hetero.init_state_hetero(EP, cfg, key)
    env_state = ppo_hetero.init_env_batch(
        EP, cfg.n_envs, jax.random.fold_in(key, 1))
    step = ppo_hetero.make_train_step_hetero(EP, cfg, nets, tx)
    _, _, _, _, m = step(params, opt_state, env_state, key)
    assert float(m["ratio_dev"]) < 1e-4, float(m["ratio_dev"])


def test_hetero_rejects_non_encode_groups():
    ep = EP.replace(agent_obs_styles=("encode", "image", "encode"))
    with pytest.raises(SystemExit, match="encode"):
        ppo_hetero.hetero_groups(ep)


def test_train_cli_hetero_e2e(tmp_path, capsys):
    """train.py --agent-config with mixed view sizes: trains, checkpoints
    (self-describing), and evaluates with NO flags but the checkpoint."""
    ck = str(tmp_path / "ck")
    spec = json.dumps([{"view_size": 5}, {"view_size": 7}])
    train.main(["--scenario", "empty", "--grid-size", "9",
                "--max-steps", "10", "--view-size", "5", "--obs", "encode",
                "--agent-config", spec,
                "--envs", "8", "--rollout", "4", "--iters", "2",
                "--epochs", "1", "--minibatches", "2",
                "--checkpoint-dir", ck, "--checkpoint-every", "2"])
    evaluate.main(["--checkpoint", ck, "--episodes", "1"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["episodes"] == 1 and stats["mean_length"] > 0


def test_agent_config_rejects_bad_json():
    with pytest.raises(SystemExit, match="JSON"):
        train.main(["--agent-config", "[not json"])
    with pytest.raises(SystemExit, match="list"):
        train.main(["--agent-config", '{"view_size": 5}'])
