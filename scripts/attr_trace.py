import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.parallel import ppo
from marlgrid_tpu.parallel.mesh import make_mesh

ep = EnvParams(width=13, height=13, n_agents=4, scenario="goal_cycle",
               max_steps=250, view_size=7, observation_style="encode",
               reward_decay=False, agent_colors=default_agent_colors(4))
cfg = ppo.PPOConfig(n_envs=4096, rollout_len=64)
mesh = make_mesh(n_model=1)
key = jax.random.PRNGKey(0)
net, params, tx, opt_state = ppo.init_state(ep, cfg, key)
env_state = ppo.init_env_batch(ep, cfg.n_envs, jax.random.fold_in(key, 1), mesh)
step = ppo.make_train_step(ep, cfg, net, tx, mesh=mesh)
lowered = step.lower(params, opt_state, env_state, key)
text = lowered.compile().as_text()
open('/tmp/train_hlo.txt', 'w').write(text)
from marlgrid_tpu.utils.profiling import hotspots
for ms, src in hotspots('/tmp/ppo_trace', text, top=25):
    print(f"{ms:9.2f} ms  {src}")
