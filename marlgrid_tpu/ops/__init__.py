"""TPU kernels (Pallas) for ops XLA compiles poorly."""
from .transpose import transpose_bk  # noqa: F401
