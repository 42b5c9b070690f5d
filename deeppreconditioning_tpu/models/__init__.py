"""Preconditioner-generating neural networks."""

from deeppreconditioning_tpu.models.precond_net import (
    PreconditionerNet,
    precond_net_specs,
)
from deeppreconditioning_tpu.models.sparse_unet import (
    PreconditionerSparseUNet,
    UNetPlanBuilder,
)
from deeppreconditioning_tpu.models.neural_fsai import (
    FSAIPlanProvider,
    NeuralFSAI,
)


def plan_builder_for(model_name: str, channels):
    """Dataset plan builder matching a model class name (the string-keyed
    selection of train.py:147-154)."""
    if model_name == "PreconditionerSparseUNet":
        return UNetPlanBuilder()
    if model_name == "NeuralFSAI":
        # NeuralFSAI consumes only the level-0 sites; a single 1x1 layer
        # keeps the generic plan machinery minimal
        return precond_net_specs((1, 1, 1))
    return precond_net_specs(channels)


__all__ = [
    "FSAIPlanProvider",
    "NeuralFSAI",
    "PreconditionerNet",
    "PreconditionerSparseUNet",
    "UNetPlanBuilder",
    "precond_net_specs",
    "plan_builder_for",
]
