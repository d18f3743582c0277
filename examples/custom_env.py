"""Custom-environment demo: the reference's `_gen_grid`-subclass workflow.

Shows the two extension surfaces a marlgrid user reaches for
(SURVEY §3.2): a custom scenario registered with WorldObj placement events
(runs inside the jitted reset — vmappable to thousands of envs), and
interactive host-side board editing with ``place_obj``/``place_agent``.
Agents carry prestige (sprite dims as they collect bonus rewards, SPEC §8)
and staggered spawn delays.
"""
import numpy as np

from marlgrid_tpu import objects as O
from marlgrid_tpu.agents import GridAgentInterface
from marlgrid_tpu.core import grid_gen
from marlgrid_tpu.utils.video import GridRecorder
from marlgrid_tpu.wrapper import MultiGridEnv


def lava_maze(params, layers, split_x, door_y):
    """8 lava hazards, 3 cyclic bonus tiles — placed via WorldObj events."""
    events = [O.Lava() for _ in range(8)]
    events += [O.BonusTile(bonus_id=b) for b in range(3)]
    return layers, events, None


def lava_maze_oracle(oracle):  # keeps the scenario parity-testable
    for _ in range(8):
        oracle._place_obj(O.Lava())
    for b in range(3):
        oracle._place_obj(O.BonusTile(bonus_id=b))
    return None


grid_gen.register_scenario("lava_maze", lava_maze, 11,
                           oracle_builder=lava_maze_oracle)


class LavaMazeEnv(MultiGridEnv):
    scenario = "lava_maze"


def main():
    agents = [
        GridAgentInterface(color="red", prestige_scale=0.5),
        GridAgentInterface(color="blue", prestige_scale=0.5, spawn_delay=5),
    ]
    env = LavaMazeEnv(agents=agents, grid_size=13, max_steps=60,
                      n_bonus_tiles=3, reward_decay=False, seed=3)
    env.reset()
    env.place_obj(O.Ball("purple"))      # interactive host-side edit
    print(env)                           # ASCII board (str_render codes)

    rec = GridRecorder(env, tile_size=16)
    rng = np.random.default_rng(0)
    done, total = False, np.zeros(env.num_agents)
    while not done:
        _, rewards, done, _ = rec.step(rng.integers(0, 7, env.num_agents))
        total += rewards
    print("episode returns:", total,
          "| prestige:", [round(a.prestige, 2) for a in env.agents])
    print("video:", rec.export_video("/tmp/marlgrid_custom.gif", fps=8))


if __name__ == "__main__":
    main()
