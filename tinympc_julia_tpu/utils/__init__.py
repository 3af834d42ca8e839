"""Utilities: checkpoint/resume, AOT export, profiling."""
from . import checkpoint, export, profiling  # noqa: F401
