"""PreconditionerNet invariants, mirroring /root/reference/tests/test_model.py.

Same checks on the forward output: shape preservation, strict upper
triangle zero, nonzero diagonal, some strict-lower fill, and SPD of
M = L L^T (symmetric + positive real eigenvalues).  Fixture: a batch of
identity matrices of size 64 (reference SIZE=64, BATCH_SIZE=2).
"""

import jax
import jax.numpy as jnp
import numpy as np

from deeppreconditioning_tpu.models import PreconditionerNet, precond_net_specs
from deeppreconditioning_tpu.models.precond_net import (
    batched_apply,
    output_to_dense,
)
from deeppreconditioning_tpu.ops.sparse_conv import (
    build_sample_plan,
    pad_sample_plans,
    stack_plans,
)

SIZE = 64
BATCH_SIZE = 2
CHANNELS = (1, 16, 32, 64, 32, 16, 1)


def _identity_batch():
    specs = precond_net_specs(CHANNELS)
    rows = np.arange(SIZE, dtype=np.int32)
    cols = np.arange(SIZE, dtype=np.int32)
    plans_host = [
        build_sample_plan(rows, cols, (SIZE, SIZE), specs)
        for _ in range(BATCH_SIZE)
    ]
    nnz0_pad = 64
    padded = pad_sample_plans(plans_host, [nnz0_pad] * BATCH_SIZE,
                              bucket=64)
    plans = tuple(stack_plans(padded))
    feats = np.zeros((BATCH_SIZE, nnz0_pad, 1), np.float32)
    feats[:, :SIZE, 0] = 1.0
    return jnp.asarray(feats), plans


def test_forward_invariants():
    model = PreconditionerNet(channels=CHANNELS)
    feats, plans = _identity_batch()
    params = model.init(jax.random.PRNGKey(69),
                        feats[0], [jax.tree.map(lambda x: x[0], p)
                                   for p in plans])
    values = batched_apply(model, params, feats, plans)
    dense = np.asarray(output_to_dense(values, plans[-1], SIZE))

    assert dense.shape == (BATCH_SIZE, SIZE, SIZE)
    for b in range(BATCH_SIZE):
        l = dense[b]
        assert np.all(np.diag(l) != 0), "diagonal must be nonzero"
        assert np.all(np.triu(l, 1) == 0), "strict upper must be zero"
        assert np.any(np.tril(l, -1) != 0), "some lower fill expected"

        m = l @ l.T
        np.testing.assert_allclose(m, m.T, rtol=1e-6)
        eig = np.linalg.eigvalsh(m)
        assert eig.min() > 0, "M = L L^T must be SPD"


def test_forward_deterministic_and_jittable():
    model = PreconditionerNet(channels=CHANNELS)
    feats, plans = _identity_batch()
    params = model.init(jax.random.PRNGKey(0),
                        feats[0], [jax.tree.map(lambda x: x[0], p)
                                   for p in plans])

    fwd = jax.jit(lambda f, p: batched_apply(model, params, f, p))
    v1 = fwd(feats, plans)
    v2 = fwd(feats, plans)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))


def test_gradients_flow():
    model = PreconditionerNet(channels=CHANNELS)
    feats, plans = _identity_batch()
    params = model.init(jax.random.PRNGKey(1),
                        feats[0], [jax.tree.map(lambda x: x[0], p)
                                   for p in plans])

    def loss_fn(params):
        values = batched_apply(model, params, feats, plans)
        return jnp.sum(values ** 2)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(grads)
    assert any(np.any(np.asarray(g) != 0) for g in flat)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
