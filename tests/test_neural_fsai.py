"""NeuralFSAI: zero-init == FSAI, training step improves, SPD output."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeppreconditioning_tpu.data.datasets import RandomSPDDataSet
from deeppreconditioning_tpu.models import (
    FSAIPlanProvider,
    NeuralFSAI,
    plan_builder_for,
)
from deeppreconditioning_tpu.models.neural_fsai import (
    batched_apply_fsai,
    batched_dense_factor,
)
from deeppreconditioning_tpu.ops.fsai import fsai_values
from deeppreconditioning_tpu.train.trainer import (
    TrainState,
    _fsai_operands,
    fsai_train_step,
    _fsai_validate_device,
)


def _setup(dof=32, batch_size=2, width=32, power=2):
    specs = plan_builder_for("NeuralFSAI", None)
    ds = RandomSPDDataSet(
        "train", dof=dof, batch_size=batch_size, specs=specs,
        sparsity=0.85, length=2 * batch_size, seed=0, shuffle=False,
    )
    provider = FSAIPlanProvider(ds, power=power, width=width)
    model = NeuralFSAI(width=width, hidden=16)
    batch = ds[0]
    plans = provider(0, batch)
    operands = _fsai_operands(
        plans, batch.features[:, :, 0], batch.systems.to_dense()
    )
    sample_plan = jax.tree.map(lambda x: x[0], plans)
    params = model.init(
        jax.random.PRNGKey(0), sample_plan, operands[0]
    )
    return ds, provider, model, params, batch, plans, operands


def test_zero_init_equals_fsai():
    ds, provider, model, params, batch, plans, operands = _setup()
    from deeppreconditioning_tpu.ops.fsai import (
        RangeFSAIPlan, range_fsai_columns,
    )
    c_model = batched_apply_fsai(model, params, plans, operands)
    base = (range_fsai_columns if isinstance(plans, RangeFSAIPlan)
            else fsai_values)
    c_base = jax.vmap(base)(plans, operands)
    np.testing.assert_allclose(
        np.asarray(c_model), np.asarray(c_base), atol=1e-12
    )


def test_spd_and_preconditioning_quality():
    ds, provider, model, params, batch, plans, operands = _setup()
    c_dense = np.asarray(batched_dense_factor(
        plans, batched_apply_fsai(model, params, plans, operands)
    ))
    from deeppreconditioning_tpu.metrics import symmetrize_tril
    a_full = np.asarray(symmetrize_tril(batch.systems.to_dense()))
    for b in range(a_full.shape[0]):
        m = c_dense[b] @ c_dense[b].T
        eig = np.linalg.eigvalsh(m)
        assert eig.min() > 0
        kappa_pre = np.linalg.cond(a_full[b])
        kappa_post = np.linalg.cond(m @ a_full[b])
        assert kappa_post < kappa_pre


def test_train_step_reduces_loss_and_stays_spd():
    ds, provider, model, params, batch, plans, operands = _setup()
    # fine-tuning from the FSAI optimum needs a small step: the exp-scale
    # refinement overshoots at the conv-net default 1e-3
    tx = optax.adam(1e-4)
    state = TrainState(params, tx.init(params), jnp.int32(0))
    feats = batch.features[:, :, 0]
    a_tril = batch.systems.to_dense()
    losses = []
    for _ in range(40):
        state, loss_val = fsai_train_step(
            model, tx, state, plans, feats, a_tril, "inverse_loss"
        )
        losses.append(float(loss_val))
    assert losses[-1] < losses[0], losses
    # validation path runs and converges
    vl, vi = _fsai_validate_device(
        model, state.params, plans, feats, a_tril,
        batch.right_hand_sides,
    )
    assert np.isfinite(float(vl))
    assert (np.asarray(vi) < 1024).all()


def test_kaporin_gradient_is_zero_at_init():
    """FSAI is the Kaporin optimum on the pattern, so the Kaporin-loss
    gradient of the zero-initialized model must vanish."""
    ds, provider, model, params, batch, plans, operands = _setup()
    from deeppreconditioning_tpu.metrics import kaporin_loss

    def loss_fn(p):
        c_vals = batched_apply_fsai(
            model, p, plans, operands.astype(jnp.float64)
        )
        c_dense = batched_dense_factor(plans, c_vals)
        return kaporin_loss(
            batch.systems.to_dense().astype(jnp.float64), c_dense
        )

    grads = jax.grad(loss_fn)(jax.tree.map(
        lambda x: x.astype(jnp.float64), params
    ))
    gmax = max(
        float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(grads)
    )
    assert gmax < 1e-7, gmax
