"""Preconditioner-generating neural networks."""

from deeppreconditioning_tpu.models.precond_net import (
    PreconditionerNet,
    precond_net_specs,
)
from deeppreconditioning_tpu.models.sparse_unet import (
    PreconditionerSparseUNet,
    UNetPlanBuilder,
)


def plan_builder_for(model_name: str, channels):
    """Dataset plan builder matching a model class name (the string-keyed
    selection of train.py:147-154)."""
    if model_name == "PreconditionerSparseUNet":
        return UNetPlanBuilder()
    return precond_net_specs(channels)


__all__ = [
    "PreconditionerNet",
    "PreconditionerSparseUNet",
    "UNetPlanBuilder",
    "precond_net_specs",
    "plan_builder_for",
]
