"""Training entry point: PPO on a registered env config, fully device-resident.

Usage (single host, all devices):
    python -m marlgrid_tpu.parallel.train --scenario goal_cycle \
        --grid-size 13 --agents 4 --envs 4096 --iters 100

Multi-host pods: run the same command per host after
``jax.distributed.initialize`` (see --distributed); the mesh spans hosts and
gradient psums ride ICI/DCN while env shards stay host-local (SURVEY §2.3).
"""
from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from ..core.state import EnvParams, default_agent_colors
from ..utils import checkpoint as ckpt_mod
from ..utils.metrics import MetricsLogger
from . import ppo
from .mesh import make_mesh


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scenario", default="goal_cycle")
    p.add_argument("--grid-size", type=int, default=13)
    p.add_argument("--agents", type=int, default=4)
    p.add_argument("--view-size", type=int, default=7)
    p.add_argument("--max-steps", type=int, default=250)
    p.add_argument("--envs", type=int, default=4096)
    p.add_argument("--rollout", type=int, default=64)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--obs", default="encode",
                   choices=["encode", "image", "rich"],
                   help="observation style fed to the learner (rich = "
                        "rendered pov + --observe fields)")
    p.add_argument("--observe", default="",
                   help="comma list of rich-obs extra fields: "
                        "rewards,position,orientation")
    p.add_argument("--torso", default=None,
                   choices=["mlp", "cnn", "cnn_image", "cnn_s2d"],
                   help="policy torso (default: mlp for encode, cnn_s2d "
                        "for image obs — the sprite kernel emits its "
                        "space-to-depth input layout for free; cnn_image "
                        "is the standard-layout Nature CNN)")
    p.add_argument("--rnn", default="", choices=["", "gru", "lstm"],
                   help="recurrent policy cell (encode obs, mlp torso): "
                        "sequence-aware PPO with env-block minibatches and "
                        "done-masked hidden state (parallel/ppo_rnn.py)")
    p.add_argument("--bptt-window", type=int, default=0,
                   help="truncated-BPTT window for --rnn: chunk the T-step "
                        "sequences into L-step windows (must divide "
                        "--rollout; 0 = full sequences). Shorter windows "
                        "trade gradient horizon for update throughput")
    p.add_argument("--agent-config", default=None,
                   help="JSON list of per-agent GridAgentInterface kwargs "
                        "(the reference's per-agent configs, SURVEY §2.1), "
                        "e.g. '[{\"view_size\":5},{\"view_size\":7}]'. "
                        "Overrides --agents; unspecified kwargs default to "
                        "the scalar flags. Heterogeneous obs configs train "
                        "one torso per config group "
                        "(parallel/ppo_hetero.py; encode obs)")
    p.add_argument("--hidden", type=int, default=128,
                   help="policy hidden width (PPOConfig.hidden)")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--minibatches", type=int, default=4)
    p.add_argument("--board-pool", type=int, default=256,
                   help="fresh-board layout pool per rollout (1 = the old "
                        "shared-board autoreset: every env resetting on a "
                        "step gets ONE layout)")
    p.add_argument("--no-stagger", action="store_true",
                   help="disable staggered initial episode phases "
                        "(synchronized first-episode completions)")
    p.add_argument("--overlap", action="store_true",
                   help="double-buffered rollout/update: iteration t's "
                        "update runs in the same program as iteration "
                        "t+1's rollout (SURVEY §2.3 actor/learner "
                        "overlap); trajectories are optimized one "
                        "iteration stale")
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="train iterations fused into one dispatched "
                        "program (amortizes per-dispatch host latency — "
                        "~20 ms/iter through the TPU relay); metrics/"
                        "checkpoints then have steps-per-call granularity")
    p.add_argument("--no-embed-palette", action="store_true",
                   help="disable the compact per-scenario one-hot "
                        "vocabularies for the encode embed (full static "
                        "vocab, the pre-round-4 behavior)")
    p.add_argument("--prestige-beta", type=float, default=None,
                   help="per-step decay of the prestige display "
                        "accumulator (GridAgentInterface prestige_beta; "
                        "default 0.95). Prestige dims agent sprites in "
                        "rendered obs — the social-learning signal")
    p.add_argument("--prestige-scale", type=float, default=None,
                   help="prestige units per sprite dim level "
                        "(GridAgentInterface prestige_scale; default 2.0; "
                        "smaller = dimming visible at lower accumulated "
                        "reward)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model-shards", type=int, default=1)
    p.add_argument("--metrics", default=None, help="JSONL metrics path")
    p.add_argument("--log-every", type=int, default=1,
                   help="fetch+print metrics every K iters (fetching "
                        "blocks the device pipeline; use K>=10 for "
                        "throughput runs)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", default=None)
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() first (pods)")
    p.add_argument("--coordinator", default=None,
                   help="with --distributed: coordinator host:port "
                        "(default: auto-detect from the cluster env)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--shard-map", action="store_true",
                   help="explicit-collective train step (jax.shard_map + "
                        "hand-written pmean/psum over 'data') instead of "
                        "the GSPMD sharding-constraint path — proven "
                        "numerically equal (tests/test_shard_map.py)")
    p.add_argument("--profile-dir", default=None,
                   help="jax.profiler trace output dir (SURVEY §5 tracing)")
    p.add_argument("--debug-nans", action="store_true",
                   help="jax_debug_nans: fail fast on NaN (SURVEY §5 "
                        "sanitizer row)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.distributed:
        kw = {}
        if args.coordinator:
            kw = dict(coordinator_address=args.coordinator,
                      num_processes=args.num_processes,
                      process_id=args.process_id)
        jax.distributed.initialize(**kw)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    if args.bptt_window and not args.rnn:
        raise SystemExit("--bptt-window is a --rnn option")
    if args.bptt_window and args.rollout % args.bptt_window:
        raise SystemExit(f"--bptt-window {args.bptt_window} must divide "
                         f"--rollout {args.rollout}")
    observe = {f.strip() for f in args.observe.split(",") if f.strip()}
    if not observe <= {"rewards", "position", "orientation"}:
        raise SystemExit(
            f"--observe: unknown field(s) "
            f"{sorted(observe - {'rewards', 'position', 'orientation'})} "
            f"(valid: rewards,position,orientation)")
    if args.agent_config:
        # per-agent GridAgentInterface kwargs — the reference's agent-list
        # ctor surface (SURVEY §2.1) on the training CLI. Unspecified kwargs
        # inherit the scalar flags; heterogeneous obs configs fold into the
        # EnvParams per-agent tables and train per-group torsos.
        import json as _json

        from ..agents import GridAgentInterface, agents_to_params_fields
        from ..core import constants as C

        try:
            spec = _json.loads(args.agent_config)
        except ValueError as e:
            raise SystemExit(f"--agent-config: invalid JSON ({e})")
        if not isinstance(spec, list) or not spec \
                or not all(isinstance(kw, dict) for kw in spec):
            raise SystemExit("--agent-config must be a non-empty JSON list "
                             "of per-agent kwargs objects")
        colors = default_agent_colors(len(spec))
        agent_list = []
        for i, kw in enumerate(spec):
            kw = dict(kw)
            kw.setdefault("color", C.COLOR_NAMES[colors[i]])
            kw.setdefault("view_size", args.view_size)
            kw.setdefault("observation_style", args.obs)
            kw.setdefault("observe_rewards", "rewards" in observe)
            kw.setdefault("observe_position", "position" in observe)
            kw.setdefault("observe_orientation", "orientation" in observe)
            try:
                agent_list.append(GridAgentInterface(**kw))
            except (TypeError, KeyError, AssertionError) as e:
                raise SystemExit(f"--agent-config agent {i}: {e}")
        ep = EnvParams(
            width=args.grid_size, height=args.grid_size,
            scenario=args.scenario, max_steps=args.max_steps,
            reward_decay=args.scenario != "goal_cycle",
            **agents_to_params_fields(agent_list))
    else:
        ep = EnvParams(
            width=args.grid_size, height=args.grid_size,
            n_agents=args.agents,
            scenario=args.scenario, max_steps=args.max_steps,
            view_size=args.view_size, observation_style=args.obs,
            observe_rewards="rewards" in observe,
            observe_position="position" in observe,
            observe_orientation="orientation" in observe,
            reward_decay=args.scenario != "goal_cycle",
            agent_colors=default_agent_colors(args.agents))
    if args.prestige_beta is not None:
        ep = ep.replace(prestige_beta=args.prestige_beta)
    if args.prestige_scale is not None:
        ep = ep.replace(prestige_scale=args.prestige_scale)
    if observe and not any(ep.agent_obs_style(i) == "rich"
                           for i in range(ep.n_agents)):
        # observe_* fields are only CONSUMED by the 'rich' style's aux
        # vector (ppo.rich_aux); without it the run trains without them
        print(f"warning: --observe {args.observe!r} is consumed by the "
              f"'rich' observation style only; --obs {args.obs} trains "
              f"WITHOUT these features (use --obs rich)", flush=True)
    torso = args.torso or ("cnn_s2d" if args.obs in ("image", "rich")
                           else "mlp")
    cfg = ppo.PPOConfig(n_envs=args.envs, rollout_len=args.rollout,
                        lr=args.lr, torso=torso, n_epochs=args.epochs,
                        n_minibatches=args.minibatches, hidden=args.hidden,
                        board_pool=args.board_pool, rnn=args.rnn,
                        bptt_window=args.bptt_window)
    if args.resume and not args.no_embed_palette:
        # param shapes must match the CHECKPOINT's embed vocabularies:
        # a config.json records them (round 4+); its absence means a
        # legacy full-vocab checkpoint — restore with palettes OFF instead
        # of failing on an orbax shape mismatch (round-4 advisor finding)
        ck_cfg = ckpt_mod.load_config(args.resume)
        if ck_cfg is None:
            print("warning: resume checkpoint has no config.json "
                  "(pre-round-4); disabling compact embed palettes "
                  "(--no-embed-palette) to match its param shapes",
                  flush=True)
            args.no_embed_palette = True
        elif ck_cfg.get("ppo", {}).get("embed_palettes") is None:
            args.no_embed_palette = True
    if (args.obs == "encode" and torso == "mlp"
            and not ep.has_hetero_obs and not args.no_embed_palette):
        # compact one-hot vocabularies for the embed (core/obs.py::
        # encode_palettes): ~2.4x fewer MXU passes on goal_cycle. Rides
        # PPOConfig so the checkpoint's config.json rebuilds the same net.
        import dataclasses as _dc

        from ..core import obs as _obs_mod

        pals = _obs_mod.encode_palettes(ep)
        if pals is not None:
            if ep.scenario not in ("empty", "cluttered", "doorkey",
                                   "goal_cycle"):
                # custom register_scenario(palette=…): verify the declared
                # vocabulary actually covers the observable codes before
                # training silently zeros OOV features (r4 advisor)
                _obs_mod.validate_encode_palette(ep)
            cfg = _dc.replace(cfg, embed_palettes=pals)
    mesh = make_mesh(n_model=args.model_shards)

    key = jax.random.PRNGKey(args.seed)
    h = None
    hetero = ep.has_hetero_obs
    if hetero:
        from ..vector import obs_groups

        if args.overlap or args.shard_map:
            raise SystemExit("heterogeneous agent configs train on the "
                             "GSPMD path (no --overlap/--shard-map)")
        # mixed STYLES (some group trains on pixels) take the
        # EnvState-store path; all-encode keeps the finer-grained
        # feature-major fast path (ppo_hetero.py)
        hetero_mixed = any(gp.observation_style != "encode"
                           for _, gp in obs_groups(ep))
        if args.rnn and hetero_mixed:
            raise SystemExit("hetero recurrent training is encode-only "
                             "(ppo_hetero_rnn.py); mixed-style groups "
                             "train feedforward (drop --rnn)")
        if args.rnn:
            from . import ppo_hetero_rnn

            net, params, tx, opt_state, h = \
                ppo_hetero_rnn.init_state_hetero_rnn(ep, cfg, key)
        elif hetero_mixed:
            from . import ppo_hetero_mixed

            net, params, tx, opt_state = \
                ppo_hetero_mixed.init_state_hetero_mixed(ep, cfg, key)
        else:
            from . import ppo_hetero

            net, params, tx, opt_state = ppo_hetero.init_state_hetero(
                ep, cfg, key)
    elif cfg.rnn:
        from . import ppo_rnn

        if args.overlap:
            raise SystemExit("--rnn does not compose with --overlap "
                             "(the double-buffered variant is feedforward)")
        if args.shard_map and args.obs != "encode":
            raise SystemExit("--rnn --shard-map is the encode path; image "
                             "recurrent runs use the default GSPMD mesh")
        net, params, tx, opt_state, h = ppo_rnn.init_state_rnn(ep, cfg, key)
    else:
        net, params, tx, opt_state = ppo.init_state(ep, cfg, key)
    # commit learner state to a REPLICATED global sharding over the mesh:
    # every process then holds the same committed global arrays, so
    # checkpoints save/restore with the right shardings and jit never sees
    # mixed device sets under multi-process (a restored single-device
    # params next to the 'data'-sharded env batch is an error)
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())
    params, opt_state = jax.tree.map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x,
        (params, opt_state))
    key = jax.device_put(key, rep)
    env_state = ppo.init_env_batch(ep, cfg.n_envs,
                                   jax.random.fold_in(key, 1), mesh,
                                   stagger=not args.no_stagger)
    key = jax.random.fold_in(key, 2)
    if h is not None:
        # carry shards like the env batch: encode-path leaves are
        # (N, B, H) (env dim 1), image-path leaves (B, N, H) (env
        # leading). Hetero carries are per-group dicts of (n_g, B, H) —
        # ALWAYS env dim 1 (a hetero run can reach here with any
        # args.obs default, e.g. every agent overriding the style)
        from jax.sharding import PartitionSpec as _P

        hspec = (_P("data")
                 if args.obs in ("image", "rich") and not hetero
                 else _P(None, "data"))
        h = jax.tree.map(lambda x: jax.device_put(
            x, NamedSharding(mesh, hspec)), h)
    if args.resume:
        tmpl = dict(params=params, opt_state=opt_state,
                    env_state=env_state, key=key)
        if h is not None:
            tmpl["h"] = h
        try:
            restored = ckpt_mod.restore(args.resume, tmpl)
            env_state = restored["env_state"]
            key = restored["key"]
            h = restored.get("h", h)
        except (KeyError, ValueError, TypeError) as e:
            # params/opt-only checkpoints (no env_state/key in the tree) are
            # a supported resume mode — but say so: a structure/shape
            # mismatch here can also mean changed --envs or genuine
            # corruption, and restarting envs fresh silently would hide it
            print(f"warning: full-system restore failed ({type(e).__name__}:"
                  f" {e}); retrying params/opt_state only — env_state, key"
                  + (", h" if h is not None else "")
                  + " restart fresh", flush=True)
            restored = ckpt_mod.restore(
                args.resume, dict(params=params, opt_state=opt_state))
        params, opt_state = restored["params"], restored["opt_state"]

    spc = max(1, args.steps_per_call)
    prev = None
    if hetero and args.rnn:
        from . import ppo_hetero_rnn, ppo_rnn

        make = lambda jit: ppo_hetero_rnn.make_train_step_hetero_rnn(  # noqa: E731
            ep, cfg, net, tx, mesh=mesh, jit=jit)
        step = (ppo_rnn.multi_step_rnn(make(False), spc) if spc > 1
                else make(True))
    elif hetero and hetero_mixed:
        from . import ppo_hetero_mixed

        make = lambda jit: ppo_hetero_mixed.make_train_step_hetero_mixed(  # noqa: E731
            ep, cfg, net, tx, mesh=mesh, jit=jit)
        step = ppo.multi_step(make(False), spc) if spc > 1 else make(True)
    elif hetero:
        from . import ppo_hetero

        make = lambda jit: ppo_hetero.make_train_step_hetero(  # noqa: E731
            ep, cfg, net, tx, mesh=mesh, jit=jit)
        step = ppo.multi_step(make(False), spc) if spc > 1 else make(True)
    elif args.rnn:
        from . import ppo_rnn

        if args.shard_map:
            make = lambda jit: ppo_rnn.make_train_step_rnn_shard_map(  # noqa: E731
                ep, cfg, net, tx, mesh, jit=jit)
        else:
            make = lambda jit: ppo_rnn.make_train_step_rnn(  # noqa: E731
                ep, cfg, net, tx, mesh=mesh, jit=jit)
        step = (ppo_rnn.multi_step_rnn(make(False), spc) if spc > 1
                else make(True))
    elif args.overlap:
        if args.shard_map:
            raise SystemExit("--overlap + --shard-map not supported")
        raw, prime = ppo.make_train_step(ep, cfg, net, tx, mesh=mesh,
                                         overlap=True, jit=(spc == 1))
        step = ppo.multi_step_overlap(raw, spc) if spc > 1 else raw
        env_state, prev, key = prime(params, env_state, key)
    elif args.shard_map:
        make = lambda jit: ppo.make_train_step_shard_map(  # noqa: E731
            ep, cfg, net, tx, mesh, jit=jit)
        step = ppo.multi_step(make(False), spc) if spc > 1 else make(True)
    else:
        make = lambda jit: ppo.make_train_step(            # noqa: E731
            ep, cfg, net, tx, mesh=mesh, jit=jit)
        step = ppo.multi_step(make(False), spc) if spc > 1 else make(True)
    log = MetricsLogger(args.metrics)
    # checkpoints are SELF-DESCRIBING: the full EnvParams + PPOConfig ride
    # the checkpoint dir as config.json, so evaluate.py (and a resume on
    # another box) reconstructs the exact training setup with no re-typed
    # flags (VERDICT r3 missing #4)
    run_config = dict(format=1,
                      env_params=ep.to_dict(),
                      ppo=ppo.ppo_config_to_dict(cfg))

    env_steps_per_iter = cfg.n_envs * cfg.rollout_len * spc
    n_calls = max(1, args.iters // spc)
    if n_calls * spc != args.iters:
        print(f"warning: --iters {args.iters} is not a multiple of "
              f"--steps-per-call {spc}; running {n_calls * spc} iterations "
              f"({n_calls} fused calls)", flush=True)
    t0 = time.time()
    last_logged = -1
    for it in range(n_calls):
        if args.profile_dir and it == 2:
            jax.profiler.start_trace(args.profile_dir)
        if args.rnn:
            params, opt_state, env_state, h, key, metrics = step(
                params, opt_state, env_state, h, key)
        elif args.overlap:
            params, opt_state, env_state, prev, key, metrics = step(
                params, opt_state, env_state, prev, key)
        else:
            params, opt_state, env_state, key, metrics = step(
                params, opt_state, env_state, key)
        # Fetching metrics forces a device->host sync; through the TPU
        # relay that costs ~0.2 s/iter (measured: 305 ms device, 490 ms
        # wall). With --log-every K the loop stays async and iterations
        # pipeline back-to-back on device.
        if (it + 1) % args.log_every == 0 or it == n_calls - 1:
            metrics = {k: float(v) for k, v in metrics.items()}
            n_it = it - last_logged
            last_logged = it
            dt = (time.time() - t0) / n_it
            t0 = time.time()
            # step = TRUE iteration index (calls x steps-per-call, 0-based
            # last completed) + cumulative env-steps, so JSONL readers need
            # no out-of-band spc knowledge (VERDICT r4 weak #4)
            log.log((it + 1) * spc - 1,
                    env_steps=(it + 1) * env_steps_per_iter,
                    env_steps_per_s=env_steps_per_iter / dt,
                    agent_steps_per_s=env_steps_per_iter * ep.n_agents / dt,
                    **metrics)
        if args.profile_dir and it == 4:
            jax.profiler.stop_trace()
        if (args.checkpoint_dir and args.checkpoint_every
                and (it + 1) % args.checkpoint_every == 0):
            # env_state + key included: exact-resume of the whole system
            # (SURVEY §5 checkpoint row; envs are just arrays). Arrays are
            # passed SHARDED — orbax writes each process's shards, so this
            # works unchanged under multi-host (a device_get here would
            # fail on non-addressable global arrays)
            payload = dict(params=params, opt_state=opt_state,
                           env_state=env_state, key=key)
            if h is not None:
                payload["h"] = h
            ckpt_mod.save(args.checkpoint_dir, payload, step=it + 1,
                          config=run_config)
    log.close()
    return params


if __name__ == "__main__":
    main()
