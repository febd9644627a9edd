"""Shared utilities."""

from tpu2048.utils.debug import checked

__all__ = ["checked"]
