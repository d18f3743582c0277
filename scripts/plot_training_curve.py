#!/usr/bin/env python
"""Plot a training-metrics JSONL (from ``marlgrid_tpu.parallel.train
--metrics``) as a learning-curve figure.

Two stacked panels (small multiples — one axis each, never dual-axis):
episode return and bonus-cycle completions per episode, over env-steps.

Usage:
    python scripts/plot_training_curve.py runs/goal_cycle.jsonl \
        --envs-per-iter 262144 --out artifacts/goal_cycle_curve.png
"""
import argparse
import json

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# categorical slots 1/2 (light mode) from the validated reference palette
BLUE = "#2a78d6"
ORANGE = "#d95926"
INK = "#0b0b0b"
MUTED = "#52514e"
GRID = "#e8e7e2"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl")
    ap.add_argument("--envs-per-iter", type=int, default=None,
                    help="env-steps per logged iteration (n_envs * rollout "
                         "* steps-per-call) — only needed for LEGACY JSONLs "
                         "without the cumulative env_steps field")
    ap.add_argument("--out", default="artifacts/training_curve.png")
    ap.add_argument("--title", default="Goal-cycle PPO learning curve")
    ap.add_argument("--panel2", default="cycles",
                    choices=["cycles", "length"],
                    help="second panel: bonus-cycle completions "
                         "(goal_cycle) or episode length (scenarios "
                         "without cycles — falling length = agents reach "
                         "the goal faster)")
    ap.add_argument("--compare", default=None,
                    help="second JSONL overlaid as a muted dashed series "
                         "(e.g. an ablation control)")
    ap.add_argument("--label", default="run",
                    help="legend label for the main series (with --compare)")
    ap.add_argument("--compare-label", default="control",
                    help="legend label for the --compare series")
    args = ap.parse_args()

    def load(path):
        rows = [json.loads(ln) for ln in open(path) if ln.strip()]
        rows = [r for r in rows if r.get("n_episodes", 0) > 0]
        if rows and "env_steps" in rows[0]:
            # round-5+ JSONLs carry cumulative env-steps per row
            xs = [r["env_steps"] / 1e6 for r in rows]
        else:
            if args.envs_per_iter is None:
                raise SystemExit(
                    "legacy JSONL without env_steps: pass --envs-per-iter "
                    "(n_envs * rollout; the step field counts fused CALLS "
                    "in legacy files)")
            xs = [(r["step"] + 1) * args.envs_per_iter / 1e6 for r in rows]

        def smooth(ys, k=5):
            """episode-count-weighted rolling mean"""
            w = [r["n_episodes"] for r in rows]
            out = []
            for i in range(len(ys)):
                lo = max(0, i - k + 1)
                num = sum(y * n for y, n in zip(ys[lo:i + 1], w[lo:i + 1]))
                den = sum(w[lo:i + 1])
                out.append(num / den)
            return out

        ret = smooth([r["episode_return"] for r in rows])
        key = ("episode_length" if args.panel2 == "length"
               else "episode_cycles")
        return rows, xs, ret, smooth([r.get(key, 0.0) for r in rows])

    rows, xs, ret, p2 = load(args.jsonl)
    cmp_series = load(args.compare) if args.compare else None
    p2_label = ("Episode length (steps; lower = faster to goal)"
                if args.panel2 == "length"
                else "Bonus-cycle completions per episode")

    fig, axes = plt.subplots(2, 1, figsize=(7.2, 5.4), sharex=True,
                             constrained_layout=True)
    for ax, ys, cys, color, label in (
            (axes[0], ret, cmp_series and cmp_series[2], BLUE,
             "Episode return (per env, mean)"),
            (axes[1], p2, cmp_series and cmp_series[3], ORANGE, p2_label)):
        ax.plot(xs, ys, color=color, linewidth=2,
                label=args.label if cmp_series else None)
        if cmp_series:
            ax.plot(cmp_series[1], cys, color=MUTED, linewidth=1.6,
                    linestyle="--", label=args.compare_label)
            ax.legend(frameon=False, fontsize=9, labelcolor=INK)
        ax.set_title(label, loc="left", fontsize=11, color=INK)
        ax.grid(True, color=GRID, linewidth=0.8)
        ax.tick_params(colors=MUTED, labelsize=9)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
    axes[1].set_xlabel("Environment steps (millions)", fontsize=10,
                       color=MUTED)
    fig.suptitle(args.title, fontsize=13, color=INK, x=0.02, ha="left")

    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, dpi=160)
    print(f"wrote {args.out} ({len(rows)} logged points, "
          f"{xs[-1]:.1f}M env-steps)")


if __name__ == "__main__":
    main()
