"""Pallas TPU kernels: the fused VMEM-resident ADMM solver."""
from . import fused  # noqa: F401
from .fused import make_fused_solver  # noqa: F401
