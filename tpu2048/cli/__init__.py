"""CLI (the reference README's intended-but-unbuilt UX, README.md:62-75)."""

from tpu2048.cli.main import build_parser, main

__all__ = ["build_parser", "main"]
