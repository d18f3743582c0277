"""Performance regression gate (SURVEY §4 item 6).

Runs ONLY when pointed at real TPU hardware: set ``MARLGRID_TPU_GATE=1``
(the default CI harness forces the CPU backend, where throughput numbers
are meaningless — the gate skips there). Each subtest runs bench.py /
train.py in a fresh subprocess WITHOUT the conftest's CPU forcing and
fails if throughput regresses below the recorded-round floor.

Thresholds are deliberately ~20% below the best recorded numbers
(BASELINE.md) so ordinary run-to-run noise passes but a real regression
(layout change, fusion break, kernel fallback) fails.
"""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("MARLGRID_TPU_GATE"),
    reason="TPU perf gate: set MARLGRID_TPU_GATE=1 on a TPU host")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# floors: ~20% under the recorded round-3 numbers (BASELINE.md)
ENCODE_FLOOR = float(os.environ.get("MARLGRID_GATE_ENCODE", 12.8e6))
IMAGE_FLOOR = float(os.environ.get("MARLGRID_GATE_IMAGE", 3.5e6))
# PPO-family floors sit ~30% under the recorded numbers, not ~20%: the
# shared TPU relay's ambient load moves the host-sync-sensitive train
# paths by up to ~18% run to run (measured 2026-08-22: the SAME commit
# read 4.17M in the morning and 3.38-3.44M under afternoon cross-load,
# while the pure device bench moved only ~2%). A real regression
# (layout change, kernel fallback) is >30%.
PPO_FLOOR = float(os.environ.get("MARLGRID_GATE_PPO", 2.9e6))
CNN_FLOOR = float(os.environ.get("MARLGRID_GATE_CNN", 0.22e6))
# the DEFAULT pixels config (2 epochs) — the best-case epochs=1 floor above
# would pass a regression confined to the multi-epoch path (VERDICT r3)
CNN2_FLOOR = float(os.environ.get("MARLGRID_GATE_CNN2", 0.15e6))
RNN_FLOOR = float(os.environ.get("MARLGRID_GATE_RNN", 1.8e6))
# the documented throughput configuration (--epochs 1 --envs 8192):
# recorded 5.60M round 5 (embed grid-step fix)
PPO_FAST_FLOOR = float(os.environ.get("MARLGRID_GATE_PPO_FAST", 4.5e6))
# hetero per-group torsos (--agent-config, mixed 5/7 views): 4.55M round 5
# (feature-major rebuild + embed grid-step fix; was 1.06M round 4);
# ~30% floor margin — see PPO_FLOOR note (measured 3.74M under cross-load)
HETERO_FLOOR = float(os.environ.get("MARLGRID_GATE_HETERO", 3.2e6))
# fused LSTM cell at the recurrent config: 2.21M round 5
LSTM_FLOOR = float(os.environ.get("MARLGRID_GATE_LSTM", 1.8e6))
# goal-cycle encode bench (BASELINE ladder row 5 — the PPO substrate):
# 12.8M round 5
GC_FLOOR = float(os.environ.get("MARLGRID_GATE_GC", 10.5e6))
# hetero recurrent (--agent-config + --rnn, mixed 5/7): 2.38M round 5
HETERO_RNN_FLOOR = float(os.environ.get("MARLGRID_GATE_HETERO_RNN", 1.9e6))
# mixed-STYLE hetero (2 encode + 2 image groups): 274k round 5
HETERO_MIXED_FLOOR = float(
    os.environ.get("MARLGRID_GATE_HETERO_MIXED", 0.22e6))


def _bench(*extra):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--reps", "2",
         "--skip-baseline", "--compile-cache",
         os.path.join(REPO, ".jax_cache_tpu"), *extra],
        capture_output=True, text=True, timeout=3000, env=env, cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)["value"]


def test_encode_throughput_floor():
    v = _bench("--envs", "16384", "--steps", "64")
    assert v >= ENCODE_FLOOR, f"encode {v:,.0f} < floor {ENCODE_FLOOR:,.0f}"


def test_image_throughput_floor():
    v = _bench("--envs", "4096", "--steps", "64", "--obs", "image")
    assert v >= IMAGE_FLOOR, f"image {v:,.0f} < floor {IMAGE_FLOOR:,.0f}"


def test_goal_cycle_encode_throughput_floor():
    """BASELINE ladder row 5 (ClutteredGoalCycleEnv 13x13 / 4 agents /
    3 bonus tiles) — the raw-env substrate the PPO rows build on; gated
    since round 5 so the ladder's numbers stay live (VERDICT r4 weak #6)."""
    v = _bench("--scenario", "goal_cycle", "--grid-size", "13",
               "--agents", "4", "--envs", "16384", "--steps", "64")
    assert v >= GC_FLOOR, f"goal_cycle {v:,.0f} < floor {GC_FLOOR:,.0f}"


HETERO_SPEC = ('[{"view_size":7},{"view_size":5},{"view_size":7},'
               '{"view_size":5}]')


def _train_bench(*extra):
    """Steady-state env-steps/s of a train.py run (last logged row)."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    out = subprocess.run(
        [sys.executable, "-m", "marlgrid_tpu.parallel.train",
         "--steps-per-call", "8", "--log-every", "2", *extra],
        capture_output=True, text=True, timeout=3000, env=env, cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr
    rows = [json.loads(ln) for ln in out.stdout.splitlines()
            if ln.startswith("{")]
    return rows[-1]["env_steps_per_s"]


GC5 = ("--scenario", "goal_cycle", "--grid-size", "13")


def test_ppo_throughput_floor():
    v = _train_bench(*GC5, "--agents", "4", "--envs", "4096",
                     "--rollout", "64", "--iters", "24")
    assert v >= PPO_FLOOR, f"ppo {v:,.0f} < floor {PPO_FLOOR:,.0f}"


def test_ppo_throughput_config_floor():
    """The documented throughput configuration (--epochs 1 --envs 8192,
    BASELINE round-4 table: 5.05M)."""
    v = _train_bench(*GC5, "--agents", "4", "--envs", "8192",
                     "--rollout", "64", "--iters", "32", "--epochs", "1")
    assert v >= PPO_FAST_FLOOR, \
        f"ppo throughput config {v:,.0f} < floor {PPO_FAST_FLOOR:,.0f}"


def test_rnn_ppo_throughput_floor():
    """Recurrent (GRU) PPO on config #5 — the sequence-aware update path."""
    v = _train_bench(*GC5, "--agents", "4", "--envs", "4096",
                     "--rollout", "64", "--iters", "24", "--rnn", "gru")
    assert v >= RNN_FLOOR, f"rnn ppo {v:,.0f} < floor {RNN_FLOOR:,.0f}"


def test_lstm_ppo_throughput_floor():
    """Fused-LSTM PPO on config #5 (equal treatment with the GRU cell —
    VERDICT r4 missing #5)."""
    v = _train_bench(*GC5, "--agents", "4", "--envs", "4096",
                     "--rollout", "64", "--iters", "24", "--rnn", "lstm")
    assert v >= LSTM_FLOOR, f"lstm ppo {v:,.0f} < floor {LSTM_FLOOR:,.0f}"


def test_hetero_ppo_throughput_floor():
    """Heterogeneous-agent PPO (--agent-config, per-group torsos)."""
    v = _train_bench(*GC5, "--agent-config", HETERO_SPEC,
                     "--envs", "4096", "--rollout", "64", "--iters", "24")
    assert v >= HETERO_FLOOR, \
        f"hetero ppo {v:,.0f} < floor {HETERO_FLOOR:,.0f}"


def test_hetero_mixed_ppo_throughput_floor():
    """Mixed-STYLE hetero PPO (encode + image groups; round 5):
    recorded 274k at 2 encode + 2 image agents, B=4096, T=32."""
    v = _train_bench(
        *GC5, "--agent-config",
        '[{"view_size":7},{"view_size":7,"observation_style":"image"},'
        '{"view_size":7},{"view_size":7,"observation_style":"image"}]',
        "--envs", "4096", "--rollout", "32", "--iters", "24")
    assert v >= HETERO_MIXED_FLOOR, \
        f"hetero mixed ppo {v:,.0f} < floor {HETERO_MIXED_FLOOR:,.0f}"


def test_hetero_rnn_ppo_throughput_floor():
    """Hetero RECURRENT PPO (--agent-config + --rnn gru; round 5):
    recorded 2.38-2.40M (both cells) at the recurrent config."""
    v = _train_bench(*GC5, "--rnn", "gru", "--agent-config", HETERO_SPEC,
                     "--envs", "4096", "--rollout", "64", "--iters", "24")
    assert v >= HETERO_RNN_FLOOR, \
        f"hetero rnn ppo {v:,.0f} < floor {HETERO_RNN_FLOOR:,.0f}"


CNN_CFG = ("--obs", "image", "--scenario", "cluttered", "--grid-size", "15",
           "--agents", "3", "--envs", "1024", "--rollout", "32",
           "--iters", "16", "--steps-per-call", "4")


def test_cnn_ppo_throughput_floor():
    """Image-obs PPO (EnvState-store rematerialization path)."""
    v = _train_bench(*CNN_CFG, "--epochs", "1")
    assert v >= CNN_FLOOR, f"cnn ppo {v:,.0f} < floor {CNN_FLOOR:,.0f}"


def test_cnn_ppo_default_epochs_throughput_floor():
    """Image-obs PPO at the DEFAULT 2-epoch config (the documented path)."""
    v = _train_bench(*CNN_CFG)
    assert v >= CNN2_FLOOR, \
        f"cnn ppo (2 epochs) {v:,.0f} < floor {CNN2_FLOOR:,.0f}"
