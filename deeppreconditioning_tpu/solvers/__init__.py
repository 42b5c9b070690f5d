"""Krylov solvers."""

from deeppreconditioning_tpu.solvers.cg import (
    benchmark_cg,
    conjugate_gradient,
    preconditioned_conjugate_gradient,
    pcg_with_history,
)

__all__ = [
    "benchmark_cg",
    "conjugate_gradient",
    "preconditioned_conjugate_gradient",
    "pcg_with_history",
]
