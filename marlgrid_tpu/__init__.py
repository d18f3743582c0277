"""marlgrid_tpu — a TPU-native multi-agent gridworld RL framework.

A ground-up JAX/XLA re-design with the capabilities of ``kandouss/marlgrid``
(see SURVEY.md): the env state is a pytree of packed arrays, ``reset`` /
``step`` / per-agent egocentric observation are pure jitted functions vmapped
over thousands of env instances, and the learner stack (rollouts, PPO,
mesh-sharded multi-host scaling) runs entirely on device.

Public surface:
- ``marlgrid_tpu.envs`` — scenario registry, ``register_marl_env``,
  ``env_from_config``, reference-style env ids.
- ``marlgrid_tpu.wrapper.MultiGridEnv`` — gym-classic host API
  (``reset() -> [obs]``, ``step(actions) -> (obs, rew, done, info)``).
- ``marlgrid_tpu.vector.VectorEnv`` — the TPU-native batched functional API.
- ``marlgrid_tpu.agents`` — ``GridAgentInterface`` / ``IndependentLearners``.
- ``marlgrid_tpu.objects`` — ``WorldObj`` classes + ``COLORS`` (the
  reference's object vocabulary; ``core.grid_gen.register_scenario`` is the
  ``_gen_grid`` extensibility hook they plug into).
- ``marlgrid_tpu.utils.video.GridRecorder`` — episode video export.
- ``marlgrid_tpu.parallel`` — device mesh sharding, rollouts, PPO.
"""

from .core.state import EnvParams, EnvState, default_agent_colors  # noqa: F401

__version__ = "0.1.0"

# Importing the package registers the named envs, mirroring the reference's
# ``marlgrid/__init__.py`` import-time registration (SURVEY §2.1).
from . import envs  # noqa: E402,F401
