"""Profiling + roofline utilities.

The reference's only instrumentation is wall-clock spans around its
loops (SURVEY.md §5: cg.py:69,88; test.py:130-135).  This module adds the
TPU-native equivalents: ``jax.profiler`` trace capture for xprof/
tensorboard, and roofline accounting for the sparse kernels
(nnz/s + bytes-moved estimates against HBM bandwidth).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/dptpu_trace"):
    """Capture a jax.profiler trace viewable in tensorboard/xprof."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class RooflineReport:
    """Measured vs light-speed throughput for a streaming sparse kernel."""

    name: str
    seconds: float
    nnz: int
    bytes_moved: int
    flops: int
    hbm_gb_s: float = 820.0  # v5e per-chip HBM bandwidth

    @property
    def gnnz_per_s(self) -> float:
        return self.nnz / self.seconds / 1e9

    @property
    def achieved_gb_s(self) -> float:
        return self.bytes_moved / self.seconds / 1e9

    @property
    def bandwidth_fraction(self) -> float:
        return self.achieved_gb_s / self.hbm_gb_s

    def summary(self) -> dict:
        return {
            "kernel": self.name,
            "time_us": round(self.seconds * 1e6, 1),
            "gnnz_per_s": round(self.gnnz_per_s, 2),
            "achieved_gb_s": round(self.achieved_gb_s, 1),
            "bandwidth_fraction": round(self.bandwidth_fraction, 3),
            "gflop_per_s": round(self.flops / self.seconds / 1e9, 1),
        }


def time_kernel(fn, *args, iters: int = 100) -> float:
    """Amortized kernel seconds: chained repetitions, one device sync.

    Per-call ``block_until_ready`` measures dispatch/tunnel latency, not
    kernel time — always amortize (see bench.py methodology).  When the
    output matches the (single) input's shape/dtype, repetitions are
    dependency-chained (y = f(y)) so the device serializes the reps and
    the host run-ahead can't overlap them away.
    """
    out = fn(*args)
    jax.block_until_ready(out)
    chain = (
        len(args) == 1
        and hasattr(out, "shape") and hasattr(args[0], "shape")
        and out.shape == args[0].shape and out.dtype == args[0].dtype
    )
    start = time.perf_counter()
    if chain:
        v = args[0]
        for _ in range(iters):
            v = fn(v)
        jax.block_until_ready(v)
    else:
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters


def dia_spmv_roofline(a, x, iters: int = 100) -> RooflineReport:
    """Roofline report for the DIA SpMV kernel on matrix `a`."""
    import numpy as np

    from deeppreconditioning_tpu.ops.pallas_spmv import dia_matvec

    secs = time_kernel(lambda v: dia_matvec(a, v), x, iters=iters)
    nnz = int(np.count_nonzero(np.asarray(a.vals)))
    itemsize = np.dtype(a.vals.dtype).itemsize
    n_diag = a.vals.shape[0]
    bytes_moved = (n_diag + 2) * a.n_pad * itemsize  # vals + x + y
    return RooflineReport(
        name=f"dia_spmv_n{a.n}",
        seconds=secs,
        nnz=nnz,
        bytes_moved=bytes_moved,
        flops=2 * nnz,
    )
