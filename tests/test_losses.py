"""Loss function tests (the reference's four candidates) + selection."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deeppreconditioning_tpu import metrics
from deeppreconditioning_tpu.data.datasets import RandomSPDDataSet
from deeppreconditioning_tpu.models import PreconditionerNet, precond_net_specs
from deeppreconditioning_tpu.train.trainer import (
    TrainState,
    _loss_from_batch,
    train_step,
)

CHANNELS = (1, 8, 16, 8, 1)
SPECS = precond_net_specs(CHANNELS)


def _setup():
    ds = RandomSPDDataSet("train", dof=16, batch_size=2, specs=SPECS,
                          sparsity=0.9, length=4, seed=5, shuffle=False)
    model = PreconditionerNet(channels=CHANNELS)
    batch = ds[0]
    sp = [jax.tree.map(lambda x: x[0], p) for p in batch.plans]
    params = model.init(jax.random.PRNGKey(0), batch.features[0], sp)
    return model, params, batch


def test_inverse_loss_identity_is_zero():
    """inverse_loss(M A - I) vanishes when L L^T = A^-1 (here A = I)."""
    n = 8
    eye = jnp.eye(n)[None]
    loss = metrics.inverse_loss(eye, eye)
    assert float(loss) < 1e-6


def test_frobenius_loss_exact_solution_zero():
    """||L L^T x - b|| = 0 when L L^T x = b exactly."""
    from deeppreconditioning_tpu.sparse.coo import BatchedCOO

    n = 4
    l = np.tril(np.random.default_rng(0).standard_normal((n, n)))
    np.fill_diagonal(l, np.abs(np.diag(l)) + 1)
    r, c = np.nonzero(l)
    idx = np.column_stack([np.zeros_like(r), r, c])
    coo = BatchedCOO.from_numpy(idx, l[r, c], 1, (n, n), bucket=16,
                                dtype=jnp.float64)
    x = np.ones(n)
    b = l @ (l.T @ x)
    loss = metrics.frobenius_loss(coo, jnp.asarray(x)[None],
                                  jnp.asarray(b)[None])
    assert float(loss) < 1e-10


def test_condition_loss_identity_is_one():
    n = 8
    eye = jnp.eye(n)[None]
    loss = metrics.condition_loss(eye, eye)
    np.testing.assert_allclose(float(loss), 1.0, rtol=1e-5)


def test_hutchinson_zero_for_exact():
    n = 8
    eye = jnp.eye(n)[None]
    loss = metrics.hutchinson_trace(jax.random.PRNGKey(0), eye, eye)
    assert float(loss) < 1e-6


@pytest.mark.parametrize("loss_name", [
    "inverse_loss", "frobenius_loss", "hutchinson_trace",
    "condition_loss",
])
def test_all_losses_train(loss_name):
    """Every loss candidate produces finite values and gradients through
    one optimization step."""
    model, params, batch = _setup()
    val = _loss_from_batch(model, params, batch, loss_name, 0)
    assert np.isfinite(float(val))

    tx = optax.adam(1e-3)
    state = TrainState(params, tx.init(params), jnp.int32(0))
    state2, loss_val = train_step(model, tx, state, batch, loss_name)
    assert np.isfinite(float(loss_val))
    # params actually moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(state2.params))
    )
    assert moved


def test_unknown_loss_raises():
    model, params, batch = _setup()
    with pytest.raises(ValueError, match="unknown loss"):
        _loss_from_batch(model, params, batch, "nope", 0)
