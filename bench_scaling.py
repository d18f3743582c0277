#!/usr/bin/env python
"""Scaling measurements (BASELINE.md scaling row).

Two axes:
- ``--mode batch``: single-chip batch-size sweep (throughput vs B) on the
  default device — how far one chip is from its roofline.
- ``--mode mesh``: data-parallel scaling efficiency over 1..K devices.
  On the TPU CI host only one chip is visible, so this mode is typically run
  with JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count=8 (the
  standard virtual-mesh harness, SURVEY §4 item 5); on a real pod slice it
  measures true ICI scaling.

Prints one JSON line per measurement (driver-parseable).
"""
import argparse
import json
import sys
import time

import numpy as np


def build(args):
    import jax
    import jax.numpy as jnp

    from marlgrid_tpu.core.state import EnvParams, default_agent_colors
    from marlgrid_tpu.core import grid_gen, obs as obs_mod, step as step_mod

    params = EnvParams(width=15, height=15, n_agents=3, scenario="cluttered",
                       n_clutter=25, max_steps=250, view_size=7,
                       observation_style="encode",
                       agent_colors=default_agent_colors(3))

    def make_rollout(B, T, sharding=None):
        @jax.jit
        def init(key):
            keys = jax.random.split(key, B)
            if sharding is not None:
                keys = jax.lax.with_sharding_constraint(keys, sharding)
            return jax.vmap(lambda k: grid_gen.reset(params, k))(keys)

        @jax.jit
        def rollout(state, key):
            fresh_keys = jax.random.split(jax.random.fold_in(key, 0xF), T)
            fresh = jax.vmap(lambda k: grid_gen.reset(params, k))(fresh_keys)

            def body(carry, fresh_t):
                state, key, acc = carry
                key, ak = jax.random.split(key)
                a = jax.random.randint(ak, (B, params.n_agents), 0, 7)
                state, rew, done, _ = step_mod.step_autoreset_with_fresh(
                    params, state, a, fresh_t)
                obs = obs_mod.all_agent_obs_b(params, state, bminor=True)
                acc = acc + rew.sum() + obs.sum(dtype=jnp.float32) / obs.size
                return (state, key, acc), None

            (state, key, acc), _ = jax.lax.scan(
                body, (state, key, jnp.zeros((), jnp.float32)), fresh)
            return state, key, acc

        return init, rollout

    return params, make_rollout


def measure(init, rollout, B, T, reps):
    import jax

    key = jax.random.PRNGKey(0)
    state = init(key)
    state, key, acc = rollout(state, jax.random.fold_in(key, 1))
    # hard sync via value fetch: block_until_ready can return without
    # waiting through the axon TPU relay (see bench.py)
    np.asarray(acc).sum()
    t0 = time.perf_counter()
    for _ in range(reps):
        state, key, acc = rollout(state, key)
    np.asarray(acc).sum()
    return B * T * reps / (time.perf_counter() - t0)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["batch", "mesh"], default="batch")
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--batches", type=int, nargs="*",
                   default=[1024, 4096, 16384, 65536])
    p.add_argument("--per-device-envs", type=int, default=512)
    p.add_argument("--force-cpu-devices", type=int, default=0,
                   help="force JAX_PLATFORMS=cpu with N virtual devices "
                        "(this host's sitecustomize overrides shell env; "
                        "the flag applies the conftest trick in-process)")
    args = p.parse_args(argv)

    if args.force_cpu_devices:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count="
              f"{args.force_cpu_devices}")
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    params, make_rollout = build(args)

    if args.mode == "batch":
        for B in args.batches:
            init, rollout = make_rollout(B, args.steps)
            sps = measure(init, rollout, B, args.steps, args.reps)
            print(json.dumps({"metric": "env_steps_per_sec", "batch": B,
                              "value": round(sps, 1),
                              "device": str(jax.devices()[0])}))
            sys.stdout.flush()
        return

    devs = jax.devices()
    base = None
    for k in [1, 2, 4, 8]:
        if k > len(devs):
            break
        mesh = Mesh(np.array(devs[:k]), ("env",))
        sharding = NamedSharding(mesh, P("env"))
        B = args.per_device_envs * k
        init, rollout = make_rollout(B, args.steps, sharding)
        sps = measure(init, rollout, B, args.steps, args.reps)
        base = base or sps
        print(json.dumps({"metric": "env_steps_per_sec", "devices": k,
                          "batch": B, "value": round(sps, 1),
                          "efficiency": round(sps / (base * k), 3)}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
