"""Multi-host bootstrap — the TPU-native communication backend layer.

The reference has no distributed runtime at all (SURVEY.md §2.4); the
TPU equivalent of NCCL/MPI initialization is ``jax.distributed`` + XLA
collectives over ICI (intra-slice) and DCN (multi-slice).  This module
wraps the standard bootstrap so every entry point can opt in with one
call, and exposes mesh builders that put the fast axis on ICI.

On a pod slice, launch the same program on every host with:
    JAX_COORDINATOR_ADDRESS=<host0>:8476 JAX_NUM_PROCESSES=<N>
    JAX_PROCESS_ID=<i> python your_script.py
or rely on TPU metadata auto-detection (no env needed on Cloud TPU).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_if_needed() -> bool:
    """Initialize jax.distributed when a multi-process env is configured.

    Returns True when running multi-process.  Safe to call always:
    single-process runs (including the tunneled single-chip dev setup)
    skip initialization.

    Must run before anything touches the XLA backend — so the env check
    comes first and no jax.devices()/process_count() call happens on
    the single-process path (those would initialize the backend and
    make a later ``jax.distributed.initialize`` impossible).
    """
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = os.environ.get("JAX_NUM_PROCESSES")
    if not (coordinator and num_processes):
        return False
    if jax.distributed.is_initialized():
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes),
        process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
    )
    return True


def solver_mesh(axis_name: str = "x") -> Mesh:
    """1-D mesh over all devices (global, multi-host aware) for the
    row-partitioned solver.  Device order follows jax.devices(), which
    keeps ring neighbors ICI-adjacent on a slice."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def train_mesh(dp: int | None = None, axis_names=("dp",)) -> Mesh:
    """Data-parallel mesh for training (batch axis over all chips)."""
    devs = np.array(jax.devices())
    if dp is not None:
        devs = devs[:dp]
    return Mesh(devs, axis_names)
