"""Trace + attribute one PPO train step's device time to source lines.

Builds the train-step program (feedforward or recurrent), runs a few
iterations under jax.profiler, and prints kernel time mapped back to
source lines via the compiled HLO metadata (utils/profiling.hotspots) —
the loop used to drive this framework's own optimization.

Usage (run from the repo root so marlgrid_tpu imports):
    python -c "exec(open('scripts/attr_trace.py').read())" [--rnn gru]
        [--bptt 16] [--envs 4096] [--epochs 2] [--trace-only-dir DIR]
"""
import argparse
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from marlgrid_tpu.core.state import EnvParams, default_agent_colors  # noqa: E402
from marlgrid_tpu.parallel import ppo, ppo_rnn  # noqa: E402
from marlgrid_tpu.parallel.mesh import make_mesh  # noqa: E402
from marlgrid_tpu.utils import profiling  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--rnn", default="")
ap.add_argument("--bptt", type=int, default=0)
ap.add_argument("--envs", type=int, default=4096)
ap.add_argument("--rollout", type=int, default=64)
ap.add_argument("--epochs", type=int, default=2)
ap.add_argument("--hidden", type=int, default=128)
ap.add_argument("--obs", default="encode")
ap.add_argument("--iters", type=int, default=3)
ap.add_argument("--trace-dir", default="/tmp/ppo_trace")
ap.add_argument("--no-run", action="store_true",
                help="attribute an EXISTING trace dir (skip execution)")
args = ap.parse_args([a for a in sys.argv[1:] if a != "--"])

ep = EnvParams(width=13, height=13, n_agents=4, scenario="goal_cycle",
               max_steps=250, view_size=7, observation_style=args.obs,
               reward_decay=False, agent_colors=default_agent_colors(4))
cfg = ppo.PPOConfig(n_envs=args.envs, rollout_len=args.rollout,
                    n_epochs=args.epochs, rnn=args.rnn,
                    bptt_window=args.bptt, hidden=args.hidden,
                    torso="cnn_s2d" if args.obs == "image" else "mlp")
if args.obs == "encode":
    # match train.py's default compact-palette embed (the traced program
    # must be the SAME program for the HLO hotspot mapping)
    import dataclasses as _dc

    from marlgrid_tpu.core import obs as _obs_mod
    _pals = _obs_mod.encode_palettes(ep)
    if _pals is not None:
        cfg = _dc.replace(cfg, embed_palettes=_pals)
mesh = make_mesh(n_model=1)
key = jax.random.PRNGKey(0)
if args.rnn:
    net, params, tx, opt_state, h = ppo_rnn.init_state_rnn(ep, cfg, key)
    env_state = ppo_rnn.init_env_batch(ep, cfg.n_envs,
                                       jax.random.fold_in(key, 1), mesh)
    step = ppo_rnn.make_train_step_rnn(ep, cfg, net, tx, mesh=mesh)
    example = (params, opt_state, env_state, h, key)
else:
    net, params, tx, opt_state = ppo.init_state(ep, cfg, key)
    env_state = ppo.init_env_batch(ep, cfg.n_envs,
                                   jax.random.fold_in(key, 1), mesh)
    step = ppo.make_train_step(ep, cfg, net, tx, mesh=mesh)
    example = (params, opt_state, env_state, key)

text = step.lower(*example).compile().as_text()
open("/tmp/train_hlo.txt", "w").write(text)

if not args.no_run:
    state = example
    out = step(*state)                      # compile + warm
    jax.block_until_ready(out[-1]["loss"])
    state = out[:-1]
    with profiling.trace(args.trace_dir):
        for _ in range(args.iters):
            out = step(*state)
            state = out[:-1]
        jax.block_until_ready(out[-1]["loss"])

for ms, src in profiling.hotspots(args.trace_dir, text, top=28):
    print(f"{ms:9.2f} ms  {src}")
