#!/usr/bin/env python
"""Embed-kernel roofline: name what bounds ops/embed.py (VERDICT r4 #2).

The fused one-hot embed runs at ~55% of its MXU FLOP bound in situ and the
round-4 palette experiment proved it is NOT contraction-pass-bound
(42 -> 15 slots, 17 -> 7 passes, end-to-end +2-3%). This script measures
the kernel STANDALONE at the PPO shapes and discriminates the remaining
hypotheses:

  hypothesis                          discriminating probe
  --------------------------------    ------------------------------------
  (a) one-hot build + sublane-        BUILD-ONLY kernel variant (the dot
      misaligned concat cost (VPU)    replaced by a row-sum) vs full kernel
  (b) MXU/grid mechanics              GEMM-ONLY variant (constant ohb tile,
                                      same dot sequence)
  (c) sample-block/grid overhead      bs sweep 128/256/512
  (d) output-write (f32 HBM)          H sweep 128/256 + bytes model

Every timing wraps K kernel calls in ONE jitted lax.scan over K distinct
code stacks (the axon relay costs ~ms per dispatch; scan amortizes it),
reports ms/call, effective TFLOP/s against the DENSE-equivalent FLOPs
(2*S_tot*cells*cw*H), and % of the v5e bf16 peak (~197 TFLOP/s).

Run ON TPU from the repo root:  python scripts/embed_roofline.py
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.getcwd())   # run from the repo root (PYTHONPATH
#                                   breaks the axon plugin registration)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from marlgrid_tpu.ops import embed as E

V5E_BF16_PEAK = 197e12        # TFLOP/s, one v5e chip
V5E_HBM = 819e9               # B/s


def _variant_kernel(cells, widths, values, mode: str):
    """Forward kernel with the full build+dot ('full'), the build only
    ('build': dot replaced by a row-sum accumulate), or the dots only
    ('gemm': ohb replaced by a broadcast of one code row)."""
    g_total = E.n_groups(cells, widths)
    cw, grp = sum(widths), E.group_size(widths)
    dn = (((0,), (0,)), ((), ()))

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[0].astype(jnp.int32)
        bs = x.shape[-1]
        if values is None:
            vocab = [jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
                     for n in widths]

            def plane_onehot(code, p):
                return (code == vocab[p]).astype(jnp.bfloat16)
        else:
            def plane_onehot(code, p):
                return jnp.concatenate(
                    [(code == int(v)).astype(jnp.bfloat16)
                     for v in values[p]], axis=0)
        acc = None
        for g in range(g_total):
            if mode == "gemm":
                ohb = jnp.broadcast_to(
                    x[0:1].astype(jnp.bfloat16), (grp * cw, bs))
            else:
                pieces = []
                for q in range(grp):
                    j = g * grp + q
                    if j >= cells:
                        pieces.append(jnp.zeros((cw, bs), jnp.bfloat16))
                        continue
                    for p, n in enumerate(widths):
                        code = x[p * cells + j][None, :]
                        if p == 2 and values is None:
                            code = jnp.minimum(code, E.N_STATE_CODES - 1)
                        pieces.append(plane_onehot(code, p))
                ohb = jnp.concatenate(pieces, axis=0)
            if mode == "build":
                # (bs, 1) f32: keeps the build live, skips the dot
                y = ohb.sum(axis=0).astype(jnp.float32)[:, None]
            else:
                y = jax.lax.dot_general(ohb, w_ref[g], dn,
                                        preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        o_ref[0] = jnp.broadcast_to(acc, o_ref[0].shape) \
            if mode == "build" else acc

    return kernel


@functools.partial(jax.jit, static_argnames=("cells", "bs", "widths",
                                             "values", "mode"))
def _fwd_variant(x, w, cells, bs, widths, values, mode):
    R, F, S = x.shape
    g, k, H = w.shape
    return pl.pallas_call(
        _variant_kernel(cells, widths, values, mode),
        grid=(R, S // bs),
        in_specs=[
            pl.BlockSpec((1, F, bs), lambda r, i: (r, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, k, H), lambda r, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bs, H), lambda r, i: (r, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, S, H), jnp.float32),
    )(x, w)


def time_variant(xs, w, cells, bs, widths, values, mode, reps=3):
    """ms/call of K scanned kernel calls (K = xs.shape[0])."""
    K = xs.shape[0]

    @jax.jit
    def run(xs, w):
        def body(acc, x):
            out = _fwd_variant(x, w, cells, bs, widths, values, mode)
            return acc + out[:, :1, :1].sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return acc

    float(run(xs, w))          # compile + settle (a VALUE fetch is the
    #                            only reliable barrier through the relay)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(xs, w))
        best = min(best, (time.perf_counter() - t0) / K)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--k", type=int, default=32, help="scanned calls")
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", "run on the TPU host"

    rng = np.random.default_rng(0)
    rows = []

    def bench(tag, R, S, H, cells, widths, values, bs, mode="full"):
        F = 3 * cells
        xs = jnp.asarray(rng.integers(0, 8, (args.k, R, F, S)), jnp.uint8)
        g = E.n_groups(cells, widths)
        k = E.group_size(widths) * sum(widths)
        w = jnp.asarray(rng.normal(size=(g, k, H)) * 0.05, jnp.bfloat16)
        ms = time_variant(xs, w, cells, bs, widths, values, mode,
                          args.reps)
        S_tot = R * S
        dense_flops = 2.0 * S_tot * cells * sum(widths) * H
        mxu_flops = 2.0 * S_tot * g * 128 * H       # padded passes
        tf = dense_flops / (ms * 1e-3) / 1e12
        hbm = (R * F * S            # codes uint8
               + R * S * H * 4)     # f32 out
        gbs = hbm / (ms * 1e-3) / 1e9
        rows.append((tag, ms, tf, 100 * tf / (V5E_BF16_PEAK / 1e12),
                     gbs, 100 * gbs / (V5E_HBM / 1e9)))
        print(f"{tag:44s} {ms*1e3:9.1f} us  {tf:7.2f} TF/s "
              f"({rows[-1][3]:5.1f}% MXU)  {gbs:7.1f} GB/s "
              f"({rows[-1][5]:5.1f}% HBM)", flush=True)

    # PPO shapes: goal_cycle 13x13, 4 agents, vs=7 -> cells=49; B=4096
    FULLW = E.WIDTHS
    # goal_cycle palette (types/colors/states from core.obs.encode_palettes)
    from marlgrid_tpu.core import obs as obs_mod
    from marlgrid_tpu.core.state import EnvParams, default_agent_colors
    ep = EnvParams(width=13, height=13, n_agents=4, scenario="goal_cycle",
                   observation_style="encode", view_size=7,
                   agent_colors=default_agent_colors(4))
    pals = obs_mod.encode_palettes(ep)
    palw = tuple(len(v) for v in pals)
    palv = tuple(tuple(int(x) for x in v) for v in pals)
    print(f"palette widths {palw} (cw={sum(palw)}, "
          f"grp={E.group_size(palw)}, g={E.n_groups(49, palw)}); "
          f"full widths {FULLW} (g={E.n_groups(49, FULLW)})\n", flush=True)

    # A fixed ~0.4 ms/call harness intercept (scan-step + relay mechanics)
    # swamps small-S absolute times; the MARGINAL cost between two large S
    # values cancels it exactly: t(S2) - t(S1) is pure per-sample kernel
    # time. Report ns/sample and the effective TF/s of the dense-
    # equivalent FLOPs at that marginal rate.
    S1, S2 = 16384, 32768

    def marginal(tag, H, cells, widths, values, bs, mode="full"):
        mss = []
        for S in (S1, S2):
            F = 3 * cells
            xs = jnp.asarray(rng.integers(0, 8, (args.k, 4, F, S)),
                             jnp.uint8)
            g = E.n_groups(cells, widths)
            k = E.group_size(widths) * sum(widths)
            w = jnp.asarray(rng.normal(size=(g, k, H)) * 0.05, jnp.bfloat16)
            mss.append(time_variant(xs, w, cells, bs, widths, values,
                                    mode, args.reps))
        dms = mss[1] - mss[0]
        dsamp = 4 * (S2 - S1)
        nsps = dms * 1e6 / dsamp
        dense_flops = 2.0 * dsamp * cells * sum(widths) * H
        tf = dense_flops / (dms * 1e-3) / 1e12
        print(f"{tag:40s} t({S1})={mss[0]*1e3:7.0f} us  "
              f"t({S2})={mss[1]*1e3:7.0f} us  marginal {nsps:6.2f} "
              f"ns/sample  {tf:7.2f} TF/s ({100*tf/(V5E_BF16_PEAK/1e12):5.1f}% MXU)",
              flush=True)
        return nsps

    print("== mode split (marginal, H=128, bs=512) ==")
    for mode in ("full", "build", "gemm"):
        marginal(f"palette mode={mode}", 128, 49, palw, palv, 512, mode)
    for mode in ("full", "build", "gemm"):
        marginal(f"full-vocab mode={mode}", 128, 49, FULLW, None, 512,
                 mode)

    print("\n== bs sweep (palette, full mode, marginal) ==")
    for bs in (256, 512):
        marginal(f"palette bs={bs}", 128, 49, palw, palv, bs)

    print("\n== H sweep (palette, full mode, marginal) ==")
    for H in (128, 256):
        marginal(f"palette H={H}", H, 49, palw, palv, 512)


if __name__ == "__main__":
    main()
