"""TPU-native usage demo: 16k envs stepping in lockstep, device-side.

Shows the first-class batched API and the throughput counter.
"""
import jax
import jax.numpy as jnp

from marlgrid_tpu import EnvParams, default_agent_colors
from marlgrid_tpu.utils.metrics import Throughput
from marlgrid_tpu.vector import VectorEnv


def main():
    params = EnvParams(width=15, height=15, n_agents=3, scenario="cluttered",
                       observation_style="encode",
                       agent_colors=default_agent_colors(3))
    env = VectorEnv(params, n_envs=16384)
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)

    thr = Throughput()
    for t in range(20):
        key, ak = jax.random.split(key)
        actions = jax.random.randint(ak, (env.n_envs, params.n_agents), 0, 7)
        state, obs, rew, done, info = env.step(state, actions)
        jax.block_until_ready(rew)
        print(f"iter {t}: {thr.update(env.n_envs):,.0f} env-steps/s, "
              f"{int(done.sum())} episodes ended")


if __name__ == "__main__":
    main()
