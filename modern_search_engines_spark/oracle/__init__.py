from .engine import OracleEngine, OracleDoc  # noqa: F401
