"""Reference-style usage demo: gym-classic loop + video export.

Mirrors the marlgrid README example (SURVEY §2.1 docs row): make a named
env, run random actions through the per-agent list API, export a gif.
"""
import numpy as np

from marlgrid_tpu.envs import make
from marlgrid_tpu.utils.video import GridRecorder


def main():
    env = make("MarlGrid-3AgentCluttered15x15-v0", seed=7)
    rec = GridRecorder(env, tile_size=16)
    rng = np.random.default_rng(0)

    obs_list = rec.reset()
    done = False
    total = np.zeros(env.num_agents)
    while not done:
        actions = rng.integers(0, 7, env.num_agents)
        obs_list, rewards, done, _ = rec.step(actions)
        total += rewards
    print("episode returns:", total)
    print("video:", rec.export_video("/tmp/marlgrid_episode.gif", fps=8))


if __name__ == "__main__":
    main()
