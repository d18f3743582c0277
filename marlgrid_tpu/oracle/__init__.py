from .oracle_env import OracleEnv  # noqa: F401
