import sys
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.parallel import ppo

ep = EnvParams(width=13, height=13, n_agents=4, scenario="goal_cycle",
               n_clutter=10, n_bonus_tiles=3, reward_decay=False,
               max_steps=250, view_size=7, observation_style="encode",
               agent_colors=default_agent_colors(4))
cfg = ppo.PPOConfig(n_envs=4096, rollout_len=64)
key = jax.random.PRNGKey(0)
net, params, tx, opt_state = ppo.init_state(ep, cfg, key)
env_state = ppo.init_env_batch(ep, cfg.n_envs, jax.random.fold_in(key, 1))
step = ppo.make_train_step(ep, cfg, net, tx)
compiled = step.lower(params, opt_state, env_state, key).compile()
open("/tmp/train_hlo.txt", "w").write(compiled.as_text())
from marlgrid_tpu.utils.profiling import hotspots
for ms, src in hotspots(sys.argv[1], open("/tmp/train_hlo.txt").read(), top=34):
    print(f"{ms:10.1f} ms  {src}")
