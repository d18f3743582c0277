"""Evaluate a trained checkpoint: greedy/sampled rollouts + video export.

Closes the loop the reference's users ran by hand (train in the author's
external repo, then watch ``GridRecorder`` gifs — SURVEY §2.1 recorder row):
restore a ``train.py`` checkpoint, drive the reference-shaped host env with
the trained policy, print a JSON stats line, optionally export a video.

Usage (env/learner args must match the training run — they rebuild the
checkpoint's pytree template):

    python -m marlgrid_tpu.parallel.evaluate --checkpoint ckpts \
        --scenario goal_cycle --grid-size 13 --agents 4 --envs 4096 \
        --episodes 5 --out eval.gif

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
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--ckpt-step", type=int, default=None)
    p.add_argument("--scenario", default="goal_cycle")
    p.add_argument("--grid-size", type=int, default=13)
    p.add_argument("--agents", type=int, default=4)
    p.add_argument("--view-size", type=int, default=7)
    p.add_argument("--max-steps", type=int, default=250)
    p.add_argument("--obs", default="encode",
                   choices=["encode", "image", "rich"])
    p.add_argument("--observe", default="",
                   help="comma list of rich-obs fields (match the "
                        "training run): rewards,position,orientation")
    p.add_argument("--torso", default=None)
    p.add_argument("--rnn", default="", choices=["", "gru", "lstm"])
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--envs", type=int, default=4096,
                   help="n_envs of the TRAINING run (checkpoint template)")
    p.add_argument("--episodes", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sample", action="store_true",
                   help="sample actions from the policy (default: argmax)")
    p.add_argument("--out", default=None, help="video path (.gif / .mp4)")
    p.add_argument("--tile-size", type=int, default=16)
    p.add_argument("--fps", type=int, default=8)
    return p.parse_args(argv)


def restore_policy(args, ep: EnvParams):
    """(net, params, h0_fn) from a train.py checkpoint."""
    # default torso mirrors train.py's (cnn_s2d for pixels)
    torso = args.torso or ("cnn_s2d" if args.obs in ("image", "rich")
                           else "mlp")
    cfg = ppo.PPOConfig(n_envs=args.envs, hidden=args.hidden, torso=torso,
                        rnn=args.rnn)
    key = jax.random.PRNGKey(0)
    if cfg.rnn:
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
        return net.initial_carry((ep.n_agents,)) if cfg.rnn else None

    return net, restored["params"], h0


def main(argv=None):
    args = parse_args(argv)
    observe = {f.strip() for f in args.observe.split(",") if f.strip()}
    assert observe <= {"rewards", "position", "orientation"}, observe
    assert not (args.obs == "rich" and args.rnn), \
        "rich-obs policies are feedforward (match training support)"
    ep = EnvParams(
        width=args.grid_size, height=args.grid_size, n_agents=args.agents,
        scenario=args.scenario, max_steps=args.max_steps,
        view_size=args.view_size, observation_style=args.obs,
        observe_rewards="rewards" in observe,
        observe_position="position" in observe,
        observe_orientation="orientation" in observe,
        reward_decay=args.scenario != "goal_cycle",
        agent_colors=default_agent_colors(args.agents))
    net, params, h0 = restore_policy(args, ep)
    torso = args.torso or ("cnn_s2d" if args.obs in ("image", "rich")
                           else "mlp")

    env = MultiGridEnv(params=ep, seed=args.seed)
    rec = GridRecorder(env, tile_size=args.tile_size) if args.out else env

    def obs_batch(obs_list):
        """Host per-agent obs list -> (pov batch, aux or None), with the
        cnn_s2d torso's space-to-depth relabeling applied host-side (the
        host wrapper emits standard-layout images)."""
        if args.obs == "rich":
            pov = np.stack([o["pov"] for o in obs_list])
            rows = []
            for i, o in enumerate(obs_list):
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
            pov = np.stack(obs_list)
            aux = None
        if torso == "cnn_s2d":
            n, hh, ww, c = pov.shape
            pov = pov.reshape(n, hh // 4, 4, ww // 4, 4, c) \
                .transpose(0, 1, 3, 2, 4, 5).reshape(n, hh // 4, ww // 4,
                                                     16 * c)
        return jnp.asarray(pov), aux

    @jax.jit
    def policy(params, obs, aux, h, key):
        if h is None:
            logits, _ = net.apply(params, obs, aux=aux)
        else:
            logits, _, h = net.apply(params, obs, h)
        a = (jax.random.categorical(key, logits) if args.sample
             else jnp.argmax(logits, axis=-1))
        return a, h

    key = jax.random.PRNGKey(args.seed + 1)
    returns, lengths = [], []
    for epi in range(args.episodes):
        obs_list = rec.reset()
        h = h0()
        done = False
        total = np.zeros(ep.n_agents)
        steps = 0
        while not done:
            obs, aux = obs_batch(obs_list)
            key, ak = jax.random.split(key)
            a, h = policy(params, obs, aux, h, ak)
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
