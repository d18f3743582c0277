"""Heterogeneous population training — the per-agent GridAgentInterface
surface end to end (SURVEY §2.1; reference: ``marlgrid/agents.py``).

Every agent picks its own view geometry AND observation style, and the
population trains in ONE device-resident program: encode groups on the
feature-major mlp path, pixel groups on the sprite pipeline with a shared
EnvState store (parallel/ppo_hetero_mixed.py). Equivalent CLI:

    python -m marlgrid_tpu.parallel.train --scenario goal_cycle \
      --grid-size 13 --agent-config '[
        {"view_size": 7},
        {"view_size": 5, "observe_rewards": true,
         "observation_style": "rich"},
        {"view_size": 7, "observation_style": "image"},
        {"view_size": 5}]' --envs 4096 --iters 100

Recurrent populations (--rnn gru|lstm) use parallel/ppo_hetero_rnn.py
(encode obs). This example runs tiny shapes so it works on CPU.
"""
import jax

from marlgrid_tpu.agents import GridAgentInterface, agents_to_params_fields
from marlgrid_tpu.core.state import EnvParams
from marlgrid_tpu.parallel import ppo, ppo_hetero_mixed

agents = [
    GridAgentInterface(color="red", view_size=7),
    GridAgentInterface(color="blue", view_size=5,
                       observation_style="rich", observe_rewards=True),
    GridAgentInterface(color="purple", view_size=5, view_tile_size=4,
                       observation_style="image"),
]
ep = EnvParams(width=11, height=11, scenario="goal_cycle", n_bonus_tiles=3,
               max_steps=50, reward_decay=False,
               **agents_to_params_fields(agents))
cfg = ppo.PPOConfig(n_envs=64, rollout_len=16, n_epochs=1, n_minibatches=2)

key = jax.random.PRNGKey(0)
nets, params, tx, opt_state = ppo_hetero_mixed.init_state_hetero_mixed(
    ep, cfg, key)
env_state = ppo.init_env_batch(ep, cfg.n_envs, jax.random.fold_in(key, 1))
step = ppo_hetero_mixed.make_train_step_hetero_mixed(ep, cfg, nets, tx)

for it in range(3):
    params, opt_state, env_state, key, m = step(params, opt_state,
                                                env_state, key)
    print(f"iter {it}: loss {float(m['loss']):+.4f} "
          f"entropy {float(m['entropy']):.3f} "
          f"return {float(m['episode_return']):.2f}")
print("3 groups (encode / rich / image) trained in one program.")
