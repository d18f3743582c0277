"""Mixed-STYLE heterogeneous PPO (parallel/ppo_hetero_mixed.py).

The reference composes per-agent observation styles freely (SURVEY §2.1
``GridAgentInterface(observation_style=…)``); through round 4 mixed-style
populations were VectorEnv/inference-only. These tests cover the trainer
that closes that: encode + image (+ rich) groups in one program, with the
pixel groups rematerialized from the shared EnvState store.
"""
import json

import jax
import numpy as np
import pytest

from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.parallel import (evaluate, ppo, ppo_hetero_mixed, train)
from marlgrid_tpu.parallel.ppo import init_env_batch

EP = EnvParams(width=9, height=9, n_agents=3, scenario="empty",
               max_steps=10, view_size=5, view_tile_size=4,
               observation_style="encode",
               agent_obs_styles=("encode", "image", "encode"),
               agent_view_sizes=(5, 5, 7),
               agent_colors=default_agent_colors(3))


def _cfg(**kw):
    kw.setdefault("n_envs", 8)
    kw.setdefault("rollout_len", 8)
    kw.setdefault("n_epochs", 1)
    kw.setdefault("n_minibatches", 2)
    return ppo.PPOConfig(**kw)


def test_mixed_train_step_runs_params_move():
    cfg = _cfg()
    key = jax.random.PRNGKey(0)
    nets, params, tx, opt_state = ppo_hetero_mixed.init_state_hetero_mixed(
        EP, cfg, key)
    assert len(nets) == 3       # (5,enc), (5,img), (7,enc) groups
    env_state = init_env_batch(EP, cfg.n_envs, jax.random.fold_in(key, 1))
    step = ppo_hetero_mixed.make_train_step_hetero_mixed(EP, cfg, nets, tx)
    p0 = jax.tree.map(lambda x: np.asarray(x), params)
    for _ in range(2):
        params, opt_state, env_state, key, m = step(params, opt_state,
                                                    env_state, key)
    m = {k: float(v) for k, v in m.items()}
    assert np.isfinite(m["loss"]) and m["entropy"] > 0
    moved = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()),
                         params, p0)
    for g in range(3):
        assert max(jax.tree.leaves(moved[g])) > 0.0, f"group {g} frozen"


def test_mixed_alignment_lr0():
    """With lr=0 the pixel groups' re-render from stored EnvStates (and
    the encode groups' stored codes) must reproduce the rollout log-probs
    exactly — the recompute path's row-alignment invariant across mixed
    per-group sample layouts."""
    cfg = _cfg(lr=0.0)
    key = jax.random.PRNGKey(0)
    nets, params, tx, opt_state = ppo_hetero_mixed.init_state_hetero_mixed(
        EP, cfg, key)
    env_state = init_env_batch(EP, cfg.n_envs, jax.random.fold_in(key, 1))
    step = ppo_hetero_mixed.make_train_step_hetero_mixed(EP, cfg, nets, tx)
    _, _, _, _, m = step(params, opt_state, env_state, key)
    assert float(m["ratio_dev"]) < 1e-4, float(m["ratio_dev"])


def test_mixed_rich_group_trains_and_aligns():
    """A rich group's update re-renders pov AND recomputes the observe_*
    aux from the stored PRE-step states — at lr=0 both must reproduce the
    rollout log-probs exactly (the aux rides the same stored state the
    rollout obs came from)."""
    ep = EP.replace(agent_obs_styles=("rich", "image", "encode"),
                    observe_rewards=True, observe_orientation=True)
    cfg = _cfg(lr=0.0)
    key = jax.random.PRNGKey(2)
    nets, params, tx, opt_state = ppo_hetero_mixed.init_state_hetero_mixed(
        ep, cfg, key)
    env_state = init_env_batch(ep, cfg.n_envs, jax.random.fold_in(key, 1))
    step = ppo_hetero_mixed.make_train_step_hetero_mixed(ep, cfg, nets, tx)
    # second step starts from mid-episode state (nonzero last_reward aux)
    params, opt_state, env_state, key, m = step(params, opt_state,
                                                env_state, key)
    _, _, _, _, m = step(params, opt_state, env_state, key)
    assert np.isfinite(float(m["loss"]))
    assert float(m["ratio_dev"]) < 1e-4, float(m["ratio_dev"])


def test_mixed_rejects_rnn():
    with pytest.raises(SystemExit, match="encode-only"):
        train.main(["--scenario", "empty", "--grid-size", "9",
                    "--max-steps", "10", "--rnn", "gru", "--agent-config",
                    '[{"view_size":5},'
                    '{"view_size":5,"observation_style":"image"}]',
                    "--envs", "8", "--rollout", "4", "--iters", "1"])


def test_train_cli_mixed_e2e(tmp_path, capsys):
    """--agent-config with mixed encode/image styles: trains, checkpoints
    (self-describing), and evaluates with NO flags but the checkpoint."""
    ck = str(tmp_path / "ck")
    spec = json.dumps([
        {"view_size": 5},
        {"view_size": 5, "observation_style": "image",
         "view_tile_size": 4}])
    train.main(["--scenario", "empty", "--grid-size", "9",
                "--max-steps", "10", "--view-size", "5", "--obs", "encode",
                "--agent-config", spec,
                "--envs", "8", "--rollout", "4", "--iters", "2",
                "--epochs", "1", "--minibatches", "2",
                "--checkpoint-dir", ck, "--checkpoint-every", "2"])
    evaluate.main(["--checkpoint", ck, "--episodes", "1"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["episodes"] == 1 and stats["mean_length"] > 0
