"""Evaluate a trained checkpoint: greedy/sampled rollouts + video export.

Closes the loop the reference's users ran by hand (train in the author's
external repo, then watch ``GridRecorder`` gifs — SURVEY §2.1 recorder row):
restore a ``train.py`` checkpoint, drive the reference-shaped host env with
the trained policy, print a JSON stats line, optionally export a video.

Checkpoints are SELF-DESCRIBING (train.py writes ``config.json`` with the
full EnvParams + PPOConfig beside the orbax steps), so this needs nothing
but the checkpoint path:

    python -m marlgrid_tpu.parallel.evaluate --checkpoint ckpts \
        --episodes 5 --out eval.gif

Explicitly passed env/model flags are cross-checked against the config and
ERROR on mismatch (a shape-coincident mismatch would restore garbage
silently); ``--max-steps`` is the eval-time override. Legacy checkpoints
without config.json rebuild the template from flags as before — EXCEPT
pre-round-4 ``--rnn gru`` checkpoints: round 4's FusedGRUCell changed the
'cell' param tree (gate-fused i/h/hn_bias vs flax's six ir/iz/in/hr/hz/hn
Dense blocks), so those restores fail loudly on a tree mismatch and cannot
be rebuilt by this code (re-train, or restore with a pre-round-4 revision).
Round 5's FusedLSTMCell breaks pre-round-5 ``--rnn lstm`` checkpoints the
same way (fused i/h kernels vs OptimizedLSTMCell's eight per-gate blocks).

The checkpoint template is built with ``jax.eval_shape`` (no env batch is
actually materialized), so evaluating a B=4096 training checkpoint on a
laptop-class host costs nothing but the parameter restore.
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..core import grid_gen
from ..core.state import EnvParams, default_agent_colors
from ..utils import checkpoint as ckpt_mod
from ..utils.video import GridRecorder
from ..wrapper import MultiGridEnv
from . import ppo


def parse_args(argv=None):
    # env/model args default to None = "take it from the checkpoint's
    # config.json" (train.py writes one since round 4 — a checkpoint is
    # self-describing and `evaluate --checkpoint ckpts` needs no other
    # flags). An explicitly passed flag must MATCH the config (a silent
    # mismatch restores garbage); legacy checkpoints without config.json
    # fall back to the historical defaults below.
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--ckpt-step", type=int, default=None)
    p.add_argument("--scenario", default=None)
    p.add_argument("--grid-size", type=int, default=None)
    p.add_argument("--agents", type=int, default=None)
    p.add_argument("--view-size", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None,
                   help="eval episode cap (overrides the training value)")
    p.add_argument("--obs", default=None,
                   choices=["encode", "image", "rich"])
    p.add_argument("--observe", default=None,
                   help="comma list of rich-obs fields (match the "
                        "training run): rewards,position,orientation")
    p.add_argument("--torso", default=None)
    p.add_argument("--rnn", default=None, choices=["", "gru", "lstm"])
    p.add_argument("--hidden", type=int, default=None)
    p.add_argument("--envs", type=int, default=None,
                   help="n_envs of the TRAINING run (checkpoint template)")
    p.add_argument("--episodes", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sample", action="store_true",
                   help="sample actions from the policy (default: argmax)")
    p.add_argument("--out", default=None, help="video path (.gif / .mp4)")
    p.add_argument("--tile-size", type=int, default=16)
    p.add_argument("--fps", type=int, default=8)
    return p.parse_args(argv)


# historical flag defaults, used only for checkpoints with no config.json
_FALLBACKS = dict(scenario="goal_cycle", grid_size=13, agents=4,
                  view_size=7, max_steps=250, obs="encode", observe="",
                  rnn="", hidden=128, envs=4096)


def _parse_observe(s):
    observe = {f.strip() for f in s.split(",") if f.strip()}
    if not observe <= {"rewards", "position", "orientation"}:
        raise SystemExit(
            f"--observe: unknown field(s) "
            f"{sorted(observe - {'rewards', 'position', 'orientation'})} "
            f"(valid: rewards,position,orientation)")
    return observe


def resolve_config(args):
    """(eval EnvParams, PPOConfig) from the checkpoint's config.json.

    Explicit CLI flags are cross-checked against the config — a mismatch on
    anything that shapes the policy/template ERRORS loudly rather than
    restoring garbage (VERDICT r3 missing #4). ``--max-steps`` alone is an
    eval-time override (it does not touch any restored shape). Checkpoints
    without config.json (pre-round-4) rebuild everything from flags with
    the historical defaults.
    """
    cfgj = ckpt_mod.load_config(args.checkpoint)
    if cfgj is None:
        for k, v in _FALLBACKS.items():
            if getattr(args, k) is None:
                setattr(args, k, v)
        observe = _parse_observe(args.observe)
        ep = EnvParams(
            width=args.grid_size, height=args.grid_size,
            n_agents=args.agents, scenario=args.scenario,
            max_steps=args.max_steps, view_size=args.view_size,
            observation_style=args.obs,
            observe_rewards="rewards" in observe,
            observe_position="position" in observe,
            observe_orientation="orientation" in observe,
            reward_decay=args.scenario != "goal_cycle",
            agent_colors=default_agent_colors(args.agents))
        torso = args.torso or ("cnn_s2d" if args.obs in ("image", "rich")
                               else "mlp")
        cfg = ppo.PPOConfig(n_envs=args.envs, hidden=args.hidden,
                            torso=torso, rnn=args.rnn)
        return ep, cfg

    ep = EnvParams.from_dict(cfgj["env_params"])
    cfg = ppo.ppo_config_from_dict(cfgj["ppo"])
    checks = [
        ("scenario", args.scenario, ep.scenario),
        ("grid-size", args.grid_size, ep.width),
        ("agents", args.agents, ep.n_agents),
        ("view-size", args.view_size, ep.view_size),
        ("obs", args.obs, ep.observation_style),
        ("torso", args.torso, cfg.torso),
        ("rnn", args.rnn, cfg.rnn),
        ("hidden", args.hidden, cfg.hidden),
        ("envs", args.envs, cfg.n_envs),
    ]
    if args.observe is not None:
        want = {f for f, on in
                [("rewards", ep.observe_rewards),
                 ("position", ep.observe_position),
                 ("orientation", ep.observe_orientation)] if on}
        checks.append(("observe", ",".join(sorted(_parse_observe(
            args.observe))), ",".join(sorted(want))))
    mism = [f"  --{n} {g!r} != checkpoint config {w!r}"
            for n, g, w in checks if g is not None and g != w]
    if mism:
        raise SystemExit(
            "evaluate: flag(s) contradict the checkpoint's config.json "
            "(the checkpoint is self-describing — just omit them):\n"
            + "\n".join(mism))
    if args.max_steps is not None and args.max_steps != ep.max_steps:
        print(f"note: eval max_steps={args.max_steps} overrides the "
              f"training value {ep.max_steps}", flush=True)
        ep = ep.replace(max_steps=args.max_steps)
    # downstream code keys off these
    args.obs = ep.observation_style
    args.torso, args.rnn = cfg.torso, cfg.rnn
    return ep, cfg


def restore_policy(args, ep: EnvParams, cfg: ppo.PPOConfig):
    """(net, params, h0_fn) from a train.py checkpoint."""
    key = jax.random.PRNGKey(0)
    if ep.has_hetero_obs and cfg.rnn:
        from . import ppo_hetero_rnn

        # hetero recurrent checkpoints: per-group LISTS + per-group carry
        net, params, tx, opt_state, h = \
            ppo_hetero_rnn.init_state_hetero_rnn(ep, cfg, key)
    elif ep.has_hetero_obs:
        from ..vector import obs_groups as _obs_groups

        # hetero checkpoints: ``net``/``params`` are per-obs-group LISTS;
        # mixed-style populations restore the style-appropriate nets
        if any(gp.observation_style != "encode"
               for _, gp in _obs_groups(ep)):
            from . import ppo_hetero_mixed

            net, params, tx, opt_state = \
                ppo_hetero_mixed.init_state_hetero_mixed(ep, cfg, key)
        else:
            from . import ppo_hetero

            net, params, tx, opt_state = ppo_hetero.init_state_hetero(
                ep, cfg, key)
        h = None
    elif cfg.rnn:
        from . import ppo_rnn

        net, params, tx, opt_state, h = ppo_rnn.init_state_rnn(ep, cfg, key)
    else:
        net, params, tx, opt_state = ppo.init_state(ep, cfg, key)
        h = None
    # the env-batch template costs nothing: eval_shape only (the restore
    # maps every leaf to ShapeDtypeStruct anyway)
    env_state = jax.eval_shape(
        lambda k: jax.vmap(lambda kk: grid_gen.reset(ep, kk))(
            jax.random.split(k, cfg.n_envs)), key)
    tmpl = dict(params=params, opt_state=opt_state, env_state=env_state,
                key=jax.eval_shape(lambda: key))
    if h is not None:
        tmpl["h"] = h
    restored = ckpt_mod.restore(args.checkpoint, tmpl, step=args.ckpt_step)

    def h0():
        if not cfg.rnn:
            return None
        if ep.has_hetero_obs:
            from ..vector import obs_groups as _obs_groups

            return {g: net[g].initial_carry((len(idxs),))
                    for g, (idxs, _) in enumerate(_obs_groups(ep))}
        return net.initial_carry((ep.n_agents,))

    return net, restored["params"], h0


def style_obs_batch(entries, ep, style, torso):
    """Host per-agent obs entries (one obs style) -> (pov/codes batch,
    aux or None), with the cnn_s2d torso's space-to-depth relabeling
    applied host-side (the host wrapper emits standard-layout images).
    Shared by the homogeneous and per-group hetero eval paths so the
    feature order / layout cannot diverge between them."""
    if style == "rich":
        pov = np.stack([o["pov"] for o in entries])
        rows = []
        for o in entries:
            r = []
            if "reward" in o:
                r.append(o["reward"])
            if "position" in o:
                r += [o["position"][0] / max(ep.width - 1, 1),
                      o["position"][1] / max(ep.height - 1, 1)]
            if "orientation" in o:
                r += [1.0 if d == o["orientation"] else 0.0
                      for d in range(4)]
            rows.append(r)
        aux = (jnp.asarray(np.asarray(rows, np.float32))
               if rows and rows[0] else None)
    else:
        pov = np.stack(entries)
        aux = None
    if torso == "cnn_s2d":
        n, hh, ww, c = pov.shape
        pov = pov.reshape(n, hh // 4, 4, ww // 4, 4, c) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(n, hh // 4, ww // 4,
                                                 16 * c)
    return jnp.asarray(pov), aux


def main(argv=None):
    args = parse_args(argv)
    ep, cfg = resolve_config(args)
    net, params, h0 = restore_policy(args, ep, cfg)
    torso = cfg.torso

    env = MultiGridEnv(params=ep, seed=args.seed)
    rec = GridRecorder(env, tile_size=args.tile_size) if args.out else env

    def obs_batch(obs_list):
        return style_obs_batch(obs_list, ep, args.obs, torso)

    @jax.jit
    def policy(params, obs, aux, h, key):
        if h is None:
            logits, _ = net.apply(params, obs, aux=aux)
        else:
            logits, _, h = net.apply(params, obs, h, aux=aux)
        a = (jax.random.categorical(key, logits) if args.sample
             else jnp.argmax(logits, axis=-1))
        return a, h

    if ep.has_hetero_obs:
        # per-group policies on the host wrapper's per-agent obs list
        # (shapes differ across groups — stack within each group only)
        from ..vector import obs_groups as _obs_groups

        groups = _obs_groups(ep)

        from . import ppo_hetero_mixed

        g_styles = [gp.observation_style for _, gp in groups]
        g_torsos = [ppo_hetero_mixed.group_cfg(cfg, gp).torso
                    if gp.observation_style != "encode" else "mlp"
                    for _, gp in groups]

        @jax.jit
        def policy_hetero(params_list, group_obs, h, key):
            acts = jnp.zeros((ep.n_agents,), jnp.int32)
            h_new = {} if h is not None else None
            for g, (idxs, _) in enumerate(groups):
                obs_g, aux_g = group_obs[g]
                kw = {} if aux_g is None else dict(aux=aux_g)
                if h is None:
                    logits, _v = net[g].apply(params_list[g], obs_g, **kw)
                else:
                    logits, _v, h_new[g] = net[g].apply(
                        params_list[g], obs_g, h[g], **kw)
                a = (jax.random.categorical(jax.random.fold_in(key, g),
                                            logits)
                     if args.sample else jnp.argmax(logits, axis=-1))
                acts = acts.at[jnp.asarray(idxs)].set(a)
            return acts, h_new

        def act(obs_list, h, ak):
            # per-group batches through the SAME style transform as the
            # homogeneous path (style_obs_batch): s2d relabel + rich aux
            group_obs = tuple(
                style_obs_batch([obs_list[i] for i in idxs], ep,
                                g_styles[g], g_torsos[g])
                for g, (idxs, _) in enumerate(groups))
            return policy_hetero(params, group_obs, h, ak)
    else:
        def act(obs_list, h, ak):
            obs, aux = obs_batch(obs_list)
            return policy(params, obs, aux, h, ak)

    key = jax.random.PRNGKey(args.seed + 1)
    returns, lengths = [], []
    for epi in range(args.episodes):
        obs_list = rec.reset()
        h = h0()
        done = False
        total = np.zeros(ep.n_agents)
        steps = 0
        while not done:
            key, ak = jax.random.split(key)
            a, h = act(obs_list, h, ak)
            obs_list, rew, done, _ = rec.step(np.asarray(a))
            total += np.asarray(rew)
            steps += 1
        returns.append(float(total.sum()))
        lengths.append(steps)
    if args.out:
        rec.export_video(args.out, fps=args.fps)
    print(json.dumps({
        "episodes": args.episodes,
        "mean_return": float(np.mean(returns)),
        "returns": returns,
        "mean_length": float(np.mean(lengths)),
        "video": args.out,
    }))


if __name__ == "__main__":
    main()
