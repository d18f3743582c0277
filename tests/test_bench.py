"""Benchmark harness as a test (SURVEY §4 item 6): the driver contract —
bench.py prints exactly one JSON line with the required keys — and the
engine path it exercises runs on CPU at a tiny config.
"""
import io
import json
import sys


def test_bench_json_contract(capsys):
    import bench

    bench.main(["--envs", "16", "--steps", "4", "--reps", "1",
                "--baseline-steps", "20"])
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"bench must print ONE stdout line, got {out}"
    d = json.loads(out[0])
    assert d["metric"] == "env_steps_per_sec"
    assert d["unit"] == "env-steps/s"
    assert d["value"] > 0
    assert d["vs_baseline"] is not None and d["vs_baseline"] > 0
