"""Batched multi-video depth serving (TPU-first; no reference
equivalent — the reference infers one video at a time)."""

from .server import DepthServer, ServeConfig

__all__ = ["DepthServer", "ServeConfig"]
