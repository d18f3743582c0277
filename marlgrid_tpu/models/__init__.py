"""Model families (MXU-friendly policy/value nets)."""
from .actor_critic import ActorCritic, RecurrentActorCritic  # noqa: F401
