#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line (driver contract).

Measures aggregate env-steps/s of the batched jitted step+obs engine on the
default JAX device (the TPU chip under axon; CPU if forced), on the
north-star config (BASELINE.json #3: ClutteredMultiGrid 15x15, 3 agents,
7x7 egocentric obs). The whole rollout runs device-side under ``lax.scan``
(random actions drawn in-graph, auto-reset on done); only a scalar checksum
returns to host per timed call.

``vs_baseline`` is the speedup over the vendored pure-Python oracle — the
stand-in for the reference's single-env Python loop (marlgrid publishes no
numbers and the reference mount is empty; BASELINE.md). The oracle's RNG
helper calls are pinned to the host CPU device so the baseline measures
Python env logic, not TPU-tunnel latency.
"""
import argparse
import json
import sys
import time

import numpy as np


def build_params(args):
    from marlgrid_tpu.core.state import EnvParams, default_agent_colors

    return EnvParams(
        width=args.grid_size, height=args.grid_size, n_agents=args.agents,
        scenario=args.scenario, n_clutter=args.clutter, max_steps=250,
        view_size=args.view_size, observation_style=args.obs,
        agent_colors=default_agent_colors(args.agents))


def engine_steps_per_sec(args, params):
    import jax
    import jax.numpy as jnp

    from marlgrid_tpu import rendering
    from marlgrid_tpu.core import grid_gen, obs as obs_mod, step as step_mod

    B, T = args.envs, args.steps
    if params.observation_style == "encode":
        luts = ()
    else:
        luts = (jnp.asarray(rendering.base_lut(params.view_tile_size)),
                jnp.asarray(rendering.agent_lut(params.view_tile_size)))

    @jax.jit
    def init(key):
        return jax.vmap(lambda k: grid_gen.reset(params, k))(
            jax.random.split(key, B))

    pool = args.board_pool
    if pool:
        pool = max(k for k in range(1, min(pool, B) + 1) if B % k == 0)

    @jax.jit
    def rollout(state, key):
        # one fresh board per step, generated vmapped OUTSIDE the scan
        # (shared-board autoreset; --independent-resets buys per-env fresh
        # boards inside the step at the cost of B resets per step;
        # --board-pool K buys a K-layout pool per rollout — the training
        # default — at K resets per rollout)
        if pool:
            fresh_b = step_mod.fresh_pool_tiled(
                params, jax.random.fold_in(key, 0xF), pool, B)
            fresh = jnp.arange(T)     # scan over step index
        elif not args.independent_resets:
            fresh_keys = jax.random.split(jax.random.fold_in(key, 0xF), T)
            fresh = jax.vmap(lambda k: grid_gen.reset(params, k))(fresh_keys)
        else:
            fresh = jnp.zeros((T,))   # unused scan carrier

        def body(carry, fresh_t):
            state, key, acc = carry
            key, ak = jax.random.split(key)
            a = jax.random.randint(ak, (B, params.n_agents), 0, 7)
            if pool:
                state, rew, done, _ = \
                    step_mod.step_autoreset_with_fresh_batch(
                        params, state, a,
                        step_mod.rotate_fresh_batch(fresh_b, fresh_t),
                        salt=fresh_t)
            elif args.independent_resets:
                state, rew, done, _ = jax.vmap(
                    lambda s, aa: step_mod.step_autoreset(params, s, aa)
                )(state, a)
            else:
                state, rew, done, _ = step_mod.step_autoreset_with_fresh(
                    params, state, a, fresh_t)
            obs = obs_mod.all_agent_obs_b(params, state, *luts, bminor=True)
            if params.observation_style == "image":
                # integer checksum accumulate: the full-image f32
                # sum-reduce measured 95 ms/rollout at B=32768 (22% — pure
                # harness cost); an int32 reduce of the uint8 output skips
                # the float convert pass. (Sliced probes were measured
                # SLOWER: slicing the Pallas output forces a relayout
                # copy of the whole buffer.)
                acc = acc + rew.sum() \
                    + obs.sum(dtype=jnp.int32).astype(jnp.float32) / obs.size
            else:
                acc = acc + rew.sum() + obs.sum(dtype=jnp.float32) / obs.size
            return (state, key, acc), None

        (state, key, acc), _ = jax.lax.scan(
            body, (state, key, jnp.zeros((), jnp.float32)), fresh)
        return state, key, acc

    key = jax.random.PRNGKey(0)
    state = init(key)
    state, key, acc = rollout(state, jax.random.fold_in(key, 1))
    float(acc)  # warmup: compile + 1 run (hard sync — see below)

    reps = args.reps
    t0 = time.perf_counter()
    for _ in range(reps):
        state, key, acc = rollout(state, key)
    # HARD sync via a scalar fetch: jax.block_until_ready was observed to
    # return WITHOUT waiting through the axon TPU relay (2026-08-21 —
    # timed loops reported billions of env-steps/s); fetching the value
    # forces the D2H roundtrip on every backend. acc depends on the whole
    # rep chain, so this times all reps.
    float(acc)
    dt = time.perf_counter() - t0

    if args.trace:
        jax.profiler.start_trace(args.trace)
        state, key, acc = rollout(state, key)
        float(acc)   # hard sync (relay-safe)
        jax.profiler.stop_trace()
        with open(f"{args.trace}/hlo.txt", "w") as f:
            f.write(rollout.lower(state, key).compile().as_text())
        from marlgrid_tpu.utils.profiling import hotspots

        for ms, src in hotspots(args.trace,
                                open(f"{args.trace}/hlo.txt").read()):
            print(f"[trace] {ms:9.2f} ms  {src}", file=sys.stderr)
    return B * T * reps / dt, float(acc)


def oracle_steps_per_sec(args, params):
    """Single-env pure-Python loop — the reference-style baseline."""
    import jax

    from marlgrid_tpu.oracle import OracleEnv

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        oracle = OracleEnv(params)
        rng = np.random.default_rng(0)
        oracle.reset(jax.random.PRNGKey(0))
        n = 0
        t0 = time.perf_counter()
        while n < args.baseline_steps:
            _, _, done, _ = oracle.step(rng.integers(0, 7, params.n_agents))
            n += 1
            if done:
                oracle.reset(jax.random.PRNGKey(n))
        dt = time.perf_counter() - t0
    return n / dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=32768)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--scenario", default="cluttered")
    p.add_argument("--grid-size", type=int, default=15)
    p.add_argument("--agents", type=int, default=3)
    p.add_argument("--clutter", type=int, default=25)
    p.add_argument("--view-size", type=int, default=7)
    p.add_argument("--obs", default="encode", choices=["encode", "image"])
    p.add_argument("--baseline-steps", type=int, default=300)
    p.add_argument("--skip-baseline", action="store_true")
    p.add_argument("--independent-resets", action="store_true",
                   help="per-env fresh boards on autoreset (vs the default "
                        "shared-board variant); quantifies the tradeoff")
    p.add_argument("--board-pool", type=int, default=0,
                   help="K-layout fresh-board pool per rollout (the PPO "
                        "training default, K=256); quantifies the pool's "
                        "cost vs the shared-board variant")
    p.add_argument("--trace", default=None,
                   help="profile one rep into this dir + print hotspots")
    p.add_argument("--compile-cache", default=None,
                   help="persistent XLA compile cache dir")
    args = p.parse_args(argv)

    if args.compile_cache:
        import jax

        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    params = build_params(args)
    eng, checksum = engine_steps_per_sec(args, params)

    if args.skip_baseline:
        base = None
        vs = None
    else:
        base = oracle_steps_per_sec(args, params)
        vs = eng / base

    import jax

    print(f"[bench] device={jax.devices()[0]} envs={args.envs} "
          f"steps={args.steps} reps={args.reps} obs={args.obs} "
          f"checksum={checksum:.1f}", file=sys.stderr)
    print(f"[bench] engine={eng:,.0f} env-steps/s "
          f"({eng * params.n_agents:,.0f} agent-steps/s); "
          f"oracle baseline={base if base else float('nan'):,.1f} env-steps/s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "env_steps_per_sec",
        "value": round(eng, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(vs, 1) if vs else None,
    }))


if __name__ == "__main__":
    main()
