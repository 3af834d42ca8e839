"""Compute ops: Riccati precompute, ADMM engine, projections, horizon scans,
adaptive-rho, and Pallas fused kernels."""
from . import admm, projections, rho, riccati, scans  # noqa: F401
