"""Preconditioner-generating neural networks."""

from deeppreconditioning_tpu.models.precond_net import (
    PreconditionerNet,
    precond_net_specs,
)

__all__ = ["PreconditionerNet", "precond_net_specs"]
