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
    p.add_argument("--obs", default="encode", choices=["encode", "image"])
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
    torso = args.torso or ("cnn_image" if args.obs == "image" else "mlp")
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
    ep = EnvParams(
        width=args.grid_size, height=args.grid_size, n_agents=args.agents,
        scenario=args.scenario, max_steps=args.max_steps,
        view_size=args.view_size, observation_style=args.obs,
        reward_decay=args.scenario != "goal_cycle",
        agent_colors=default_agent_colors(args.agents))
    net, params, h0 = restore_policy(args, ep)

    env = MultiGridEnv(params=ep, seed=args.seed)
    rec = GridRecorder(env, tile_size=args.tile_size) if args.out else env

    @jax.jit
    def policy(params, obs, h, key):
        if h is None:
            logits, _ = net.apply(params, obs)
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
            obs = jnp.asarray(np.stack(obs_list))
            key, ak = jax.random.split(key)
            a, h = policy(params, obs, h, ak)
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
