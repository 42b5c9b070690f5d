"""Config system — params.yaml replacement for dvc.api.params_show.

The reference injects hyperparameters into every entry point through
``dvc.api.params_show()`` reading ``params.yaml``
(reference: params.yaml:1-15; train.py:145, test.py:207,
generate_data.py:90).  Same file format and keys here, read directly with
pyyaml; model/dataset selection stays string-keyed
(train.py:147-154's getattr registry pattern).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import List

import yaml

DEFAULT_PARAMS = {
    # reference params.yaml defaults
    "model": "PreconditionerNet",
    "data": "SludgePatternDataSet",
    "number_samples": 500,
    "resolution": 128,
    "mesh_cells": 2,
    "channels": [1, 16, 32, 64, 32, 16, 1],
    "batch_size": 4,
    "learning_rate": 0.001,
    "patience": 16,
    # rebuild-specific knobs
    "loss": "inverse_loss",
    "schedule": "constant",
    "seed": 69,
    "data_root": "assets/data/raw",
    "checkpoint_dir": "assets/checkpoints",
    "metrics_dir": "assets/metrics",
    "results_dir": "assets/results",
    "max_epochs": 200,
}


@dataclass
class Params:
    model: str
    data: str
    number_samples: int
    resolution: int
    mesh_cells: int
    channels: List[int]
    batch_size: int
    learning_rate: float
    patience: int
    loss: str
    schedule: str
    seed: int
    data_root: str
    checkpoint_dir: str
    metrics_dir: str
    results_dir: str
    max_epochs: int
    extra: dict = field(default_factory=dict)


def params_show(path: str | Path = "params.yaml") -> Params:
    """Load params.yaml merged over defaults (dvc.api.params_show
    equivalent)."""
    merged = dict(DEFAULT_PARAMS)
    p = Path(path)
    if p.exists():
        with p.open() as fio:
            loaded = yaml.safe_load(fio) or {}
        merged.update(loaded)
    known = {k: merged.pop(k) for k in list(DEFAULT_PARAMS)}
    return Params(**known, extra=merged)


def get_model_class(name: str):
    """String -> model class (getattr registry, train.py:147)."""
    import deeppreconditioning_tpu.models as models

    return getattr(models, name)


def get_dataset_class(name: str):
    """String -> dataset class (train.py:154)."""
    import deeppreconditioning_tpu.data.datasets as datasets

    return getattr(datasets, name)
