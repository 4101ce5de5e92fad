from .oracle import OracleEnv

__all__ = ["OracleEnv"]
