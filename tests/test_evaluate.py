"""Trained-checkpoint evaluation CLI (parallel/evaluate.py): train ->
checkpoint -> restore -> policy rollout -> stats/video."""
import json
import os

import pytest

from marlgrid_tpu.parallel import evaluate, train

ENV_ARGS = ["--scenario", "empty", "--grid-size", "9", "--agents", "2",
            "--max-steps", "10", "--view-size", "5"]


def _train(tmp_path, extra=()):
    ck = str(tmp_path / "ck")
    train.main(ENV_ARGS + ["--envs", "8", "--rollout", "4", "--iters", "2",
                           "--checkpoint-dir", ck, "--checkpoint-every", "2",
                           *extra])
    return ck


@pytest.mark.parametrize("rnn", ["", "gru"])
def test_evaluate_from_checkpoint(tmp_path, capsys, rnn):
    extra = ["--rnn", rnn] if rnn else []
    ck = _train(tmp_path, extra)
    out = str(tmp_path / "eval.gif")
    evaluate.main(ENV_ARGS + ["--checkpoint", ck, "--envs", "8",
                              "--episodes", "2", "--out", out, *extra])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["episodes"] == 2
    assert stats["mean_length"] > 0
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_evaluate_rich_cnn_s2d(tmp_path, capsys):
    """rich-obs checkpoint (cnn_s2d torso, the pixels default) evaluates
    through the host wrapper's per-agent dicts: pov restacked + host-side
    space-to-depth + aux rebuilt with the training normalization."""
    rich = ["--obs", "rich", "--observe", "rewards,position,orientation"]
    env_args = ["--scenario", "cluttered", "--grid-size", "9",
                "--agents", "2", "--max-steps", "8", "--view-size", "5"]
    ck = str(tmp_path / "ck")
    train.main(env_args + rich + [
        "--envs", "8", "--rollout", "4", "--iters", "2", "--epochs", "1",
        "--checkpoint-dir", ck, "--checkpoint-every", "2"])
    evaluate.main(env_args + rich + ["--checkpoint", ck, "--envs", "8",
                                     "--episodes", "1"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["episodes"] == 1 and stats["mean_length"] > 0


def test_evaluate_self_describing_no_args(tmp_path, capsys):
    """Round-4 checkpoints carry config.json: evaluate needs ONLY the
    checkpoint path — env + policy reconstruct themselves."""
    ck = _train(tmp_path)
    evaluate.main(["--checkpoint", ck, "--episodes", "1"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["episodes"] == 1 and stats["mean_length"] > 0


def test_evaluate_config_mismatch_errors(tmp_path):
    """An explicit flag contradicting config.json dies loudly instead of
    restoring a shape-coincident wrong template."""
    ck = _train(tmp_path)
    with pytest.raises(SystemExit, match="contradict"):
        evaluate.main(["--checkpoint", ck, "--agents", "5"])
    with pytest.raises(SystemExit, match="contradict"):
        evaluate.main(["--checkpoint", ck, "--rnn", "gru"])


def test_evaluate_max_steps_override(tmp_path, capsys):
    """--max-steps is the sanctioned eval-time override (no shapes)."""
    ck = _train(tmp_path)
    evaluate.main(["--checkpoint", ck, "--episodes", "1",
                   "--max-steps", "5"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["mean_length"] <= 5


def test_evaluate_sampled_runs(tmp_path, capsys):
    ck = _train(tmp_path)
    evaluate.main(ENV_ARGS + ["--checkpoint", ck, "--envs", "8",
                              "--episodes", "1", "--sample"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["episodes"] == 1 and stats["video"] is None
