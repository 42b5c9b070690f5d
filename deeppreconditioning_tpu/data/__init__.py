"""Data generation and dataset loading."""

from deeppreconditioning_tpu.data.fvm import (
    assemble_pressure_poisson,
    generate_sludge_case,
)
from deeppreconditioning_tpu.data.datasets import (
    SludgePatternDataSet,
    RandomSPDDataSet,
    StAnDataSet,
)

__all__ = [
    "assemble_pressure_poisson",
    "generate_sludge_case",
    "SludgePatternDataSet",
    "RandomSPDDataSet",
    "StAnDataSet",
]
