"""Test configuration: 8 virtual CPU devices + float64.

Multi-device code (parallel/) is tested the standard JAX way — a virtual
CPU mesh via ``--xla_force_host_platform_device_count`` — so the full
sharding path runs without a pod.

This environment force-registers a TPU backend at interpreter start (via
sitecustomize) and sets ``jax_platforms="axon,cpu"``; only one process at
a time can hold the TPU tunnel, so tests MUST pin themselves to CPU.  Env
vars are too late (sitecustomize already imported jax), so we override the
config value directly before any backend initializes.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
