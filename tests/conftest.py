"""Test configuration.

All unit/parity tests run on CPU with 8 virtual devices
(xla_force_host_platform_device_count) and x64 enabled: golden parity against
the reference C++ double-precision ADMM needs float64, and the sharding tests
need a multi-device mesh without TPU hardware (SURVEY.md §4).

Note: this environment force-registers an `axon` TPU platform via
sitecustomize, ignoring JAX_PLATFORMS env; `jax.config.update` below overrides
it before any backend is initialized.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
