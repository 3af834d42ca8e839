"""Benchmark model families (the reference's example workloads, SURVEY.md §2.5)."""
from . import cartpole, quadrotor, rocket  # noqa: F401
