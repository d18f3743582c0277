import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
from marlgrid_tpu.core.state import EnvParams, default_agent_colors
from marlgrid_tpu.core import obs as obs_mod, step as step_mod
from marlgrid_tpu.parallel import ppo

ep = EnvParams(width=13, height=13, n_agents=4, scenario="goal_cycle",
               n_clutter=10, n_bonus_tiles=3, reward_decay=False,
               max_steps=250, view_size=7, observation_style="encode",
               agent_colors=default_agent_colors(4))
cfg = ppo.PPOConfig(n_envs=4096, rollout_len=64)
key = jax.random.PRNGKey(0)
net, params, tx, opt_state = ppo.init_state(ep, cfg, key)
env_state = ppo.init_env_batch(ep, cfg.n_envs, jax.random.fold_in(key, 1))
B, T, N, vs = 4096, 64, 4, 7

def bench(name, fn, *args, reps=3):
    out = fn(*args); jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:42s} {dt*1e3:9.1f} ms", flush=True)
    return out, dt

# R1: rollout with net policy (current code path)
step = ppo.make_train_step(ep, cfg, net, tx)

# R0: env-only rollout (random actions), same autoreset style as ppo
@jax.jit
def env_only(env_state, key):
    def body(carry, _):
        st, key = carry
        key, ak = jax.random.split(key)
        a = jax.random.randint(ak, (B, N), 0, 7)
        st, rew, done, info = step_mod.step_autoreset_batch(ep, st, a)
        obs = obs_mod.all_agent_obs_b(ep, st)
        return (st, key), obs.sum()
    (st, key), s = jax.lax.scan(body, (env_state, key), None, length=T)
    return s.sum()
bench("R0 env-only rollout (B-major obs)", env_only, env_state, key)

@jax.jit
def env_only_bm(env_state, key):
    def body(carry, _):
        st, key = carry
        key, ak = jax.random.split(key)
        a = jax.random.randint(ak, (B, N), 0, 7)
        st, rew, done, info = step_mod.step_autoreset_batch(ep, st, a)
        obs = obs_mod.all_agent_obs_b(ep, st, bminor=True)
        return (st, key), obs.sum()
    (st, key), s = jax.lax.scan(body, (env_state, key), None, length=T)
    return s.sum()
bench("R0b env-only rollout (bminor obs)", env_only_bm, env_state, key)

# R1: rollout with net inference inline (no traj storage)
@jax.jit
def net_rollout(params, env_state, key):
    def body(carry, _):
        st, key = carry
        key, ak = jax.random.split(key)
        obs = obs_mod.all_agent_obs_b(ep, st)
        logits, value = net.apply(params, obs)
        a = jax.random.categorical(ak, logits)
        st, rew, done, info = step_mod.step_autoreset_batch(ep, st, a)
        return (st, key), value.sum()
    (st, key), s = jax.lax.scan(body, (env_state, key), None, length=T)
    return s.sum()
bench("R1 rollout + net inference", net_rollout, params, env_state, key)

# R2: full rollout with traj storage (ppo.rollout via train_step w/o update):
# approximate by full train_step
_, dt = bench("R3 full train_step", step, params, opt_state, env_state, key, reps=2)
print(f"train_step -> {B*T/dt:,.0f} env-steps/s")
