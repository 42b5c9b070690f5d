"""Krylov solvers."""

from deeppreconditioning_tpu.solvers.cg import (
    conjugate_gradient,
    preconditioned_conjugate_gradient,
    pcg_with_history,
)

__all__ = [
    "conjugate_gradient",
    "preconditioned_conjugate_gradient",
    "pcg_with_history",
]
