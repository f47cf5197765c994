"""Session builders and plan-level configuration."""

from .session import build_session

__all__ = ["build_session"]
