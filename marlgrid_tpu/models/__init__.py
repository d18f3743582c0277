"""Model families (MXU-friendly policy/value nets)."""
from .actor_critic import ActorCritic  # noqa: F401
