"""Data-parallel training equivalence (SURVEY §2.4 item 1): dp-sharded
epochs must reproduce single-device epochs — same losses, same params —
because DP only changes where the batch lives, not the math."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from deeppreconditioning_tpu.data.datasets import RandomSPDDataSet
from deeppreconditioning_tpu.models import (
    FSAIPlanProvider,
    NeuralFSAI,
    PreconditionerNet,
    precond_net_specs,
)
from deeppreconditioning_tpu.train.trainer import train, train_neural_fsai

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


class _View:
    def __init__(self, base, indices):
        self.base = base
        self.indices = list(indices)
        self.batch_size = base.batch_size

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.base[self.indices[i]]


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("dp",))


def _metrics(tmp_path, tag):
    return tmp_path / f"metrics_{tag}", tmp_path / f"ckpt_{tag}"


def test_conv_dp_epoch_losses_match_single_device(tmp_path):
    channels = (1, 4, 4, 4, 1)
    specs = precond_net_specs(channels)
    ds = RandomSPDDataSet(
        "train", dof=24, batch_size=8, specs=specs, sparsity=0.8,
        length=20, seed=0, shuffle=False,
    )
    train_set, val_set = _View(ds, range(1)), _View(ds, range(1, 2))
    model = PreconditionerNet(channels=channels)

    losses = {}
    for tag, mesh in (("single", None), ("dp", _mesh(8))):
        mdir, cdir = _metrics(tmp_path, tag)
        train(model, train_set, val_set, learning_rate=1e-3,
              max_epochs=3, patience=10, checkpoint_dir=cdir,
              metrics_dir=mdir, seed=0, mesh=mesh)
        logged = [
            float(line.split('"value": ')[1].split(",")[0])
            for line in (mdir / "metrics.jsonl").read_text().splitlines()
            if "train/loss" in line
        ]
        losses[tag] = logged
    np.testing.assert_allclose(
        losses["single"], losses["dp"], rtol=2e-4, atol=1e-6
    )


def test_fsai_dp_epoch_losses_match_single_device(tmp_path):
    specs = precond_net_specs((1, 1, 1))
    ds = RandomSPDDataSet(
        "train", dof=24, batch_size=8, specs=specs, sparsity=0.8,
        length=20, seed=1, shuffle=False,
    )
    train_set, val_set = _View(ds, range(1)), _View(ds, range(1, 2))
    width = 24
    provider = FSAIPlanProvider(ds, power=2, width=width)
    model = NeuralFSAI(width=width, hidden=8)

    losses = {}
    for tag, mesh in (("single", None), ("dp", _mesh(8))):
        mdir, cdir = _metrics(tmp_path, tag)
        train_neural_fsai(
            model, train_set, val_set, provider, learning_rate=1e-4,
            max_epochs=3, patience=10, checkpoint_dir=cdir,
            metrics_dir=mdir, seed=1, loss="pcg_loss", pcg_steps=4,
            mesh=mesh,
        )
        logged = [
            float(line.split('"value": ')[1].split(",")[0])
            for line in (mdir / "metrics.jsonl").read_text().splitlines()
            if "train/loss" in line
        ]
        losses[tag] = logged
    np.testing.assert_allclose(
        losses["single"], losses["dp"], rtol=2e-4, atol=1e-6
    )
