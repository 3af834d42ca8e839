"""tinympc_julia_tpu — a TPU-native ADMM MPC framework.

A from-scratch re-design of TinyMPC/tinympc-julia for TPU hardware: the solver
is a pure function over pytrees (jit/vmap/shard_map-compatible), the hot loop
is XLA-compiled with optional Pallas fused kernels, horizons can run as
log-depth associative scans, and thousands of MPC instances batch/shard across
a device mesh.

Public surface mirrors the reference Julia module exports
(/root/reference/src/TinyMPC.jl:3-6).
"""

from .types import (  # noqa: F401
    Cache,
    ConeSet,
    Problem,
    Settings,
    Solution,
    State,
    default_settings,
    init_state,
    make_problem,
)
from .ops import admm, projections, riccati, scans  # noqa: F401
from .ops import rho as rho_adaptation  # noqa: F401
from .ops.admm import solve  # noqa: F401
from .ops.riccati import (  # noqa: F401
    compute_sensitivity_autograd,
    compute_sensitivity_fd,
    precompute_cache,
    solve_lqr,
)
from .api import BatchWarmCarry, TinyMPCSolver  # noqa: F401

__version__ = "0.1.0"

__all__ = [
    "Cache", "ConeSet", "Problem", "Settings", "Solution", "State",
    "BatchWarmCarry", "TinyMPCSolver", "default_settings", "init_state", "make_problem",
    "precompute_cache", "solve", "solve_lqr",
    "compute_sensitivity_autograd", "compute_sensitivity_fd",
]
