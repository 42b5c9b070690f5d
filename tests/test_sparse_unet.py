"""SparseUNet: plan topology, inverse-conv semantics, model invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from deeppreconditioning_tpu.models.sparse_unet import (
    _DOWN,
    PreconditionerSparseUNet,
    UNetPlanBuilder,
    UNET_TOPOLOGY,
)
from deeppreconditioning_tpu.ops.sparse_conv import (
    build_conv_maps,
    build_inverse_conv_maps,
    pad_plans_by_level,
    stack_plans,
)

SIZE = 32
CHANNELS = (1, 4, 8, 8, 8, 4, 1)


def _identity_sites(n):
    return (np.arange(n, dtype=np.int32), np.arange(n, dtype=np.int32))


def test_strided_conv_downsamples():
    rows, cols = _identity_sites(16)
    o_rows, o_cols, gather, hw_out = build_conv_maps(
        rows, cols, (16, 16), _DOWN
    )
    assert hw_out == (8, 8)
    assert o_rows.max() < 8 and o_cols.max() < 8
    assert gather.shape[0] == 9


def test_inverse_conv_is_adjoint_of_forward():
    """With all-ones weights, inverse-conv gather must be the transpose
    relation of the forward strided conv: input site o contributes to
    downsampled site d through offset k iff d gathers o through k."""
    rng = np.random.default_rng(0)
    h = w = 12
    lin = np.sort(rng.choice(h * w, size=30, replace=False))
    rows = (lin // w).astype(np.int32)
    cols = (lin % w).astype(np.int32)
    d_rows, d_cols, fwd_gather, hw_down = build_conv_maps(
        rows, cols, (h, w), _DOWN
    )
    inv_gather = build_inverse_conv_maps(
        d_rows, d_cols, hw_down, rows, cols, _DOWN
    )
    # pair sets must match exactly (transposition)
    fwd_pairs = set()
    for k in range(9):
        for d_idx in range(d_rows.shape[0]):
            o_idx = fwd_gather[k, d_idx]
            if o_idx >= 0:
                fwd_pairs.add((k, int(o_idx), d_idx))
    inv_pairs = set()
    for k in range(9):
        for o_idx in range(rows.shape[0]):
            d_idx = inv_gather[k, o_idx]
            if d_idx >= 0:
                inv_pairs.add((k, o_idx, int(d_idx)))
    assert fwd_pairs == inv_pairs


def test_unet_plan_topology():
    rows, cols = _identity_sites(SIZE)
    plan = UNetPlanBuilder().build(rows, cols, (SIZE, SIZE))
    assert len(plan.layer_rows) == len(UNET_TOPOLOGY)
    assert len(plan.level_nnz) == 5
    # skip-connection operands share the site sets: up3 out == enc4 out
    names = [t[0] for t in UNET_TOPOLOGY]
    up3, enc4 = names.index("up3"), names.index("enc4")
    np.testing.assert_array_equal(plan.layer_rows[up3],
                                  plan.layer_rows[enc4])
    up0, enc1 = names.index("up0"), names.index("enc1")
    np.testing.assert_array_equal(plan.layer_rows[up0],
                                  plan.layer_rows[enc1])
    # level 0 out sites == input sites
    np.testing.assert_array_equal(plan.layer_rows[enc1], rows)


def _unet_batch(batch_size=2):
    builder = UNetPlanBuilder()
    rows, cols = _identity_sites(SIZE)
    plans_host = [builder.build(rows, cols, (SIZE, SIZE))
                  for _ in range(batch_size)]
    buckets = [((m + 63) // 64) * 64 for m in plans_host[0].level_nnz]
    padded = pad_plans_by_level(plans_host, buckets)
    plans = tuple(stack_plans(padded))
    feats = np.zeros((batch_size, buckets[0], 1), np.float32)
    feats[:, :SIZE, 0] = 1.0
    return jnp.asarray(feats), plans


def test_unet_forward_invariants():
    """Reference test_model.py invariants on the U-Net: shape, tril-ness,
    positive diagonal, SPD of L L^T."""
    from deeppreconditioning_tpu.models.precond_net import (
        batched_apply,
        output_to_dense,
    )

    model = PreconditionerSparseUNet(channels=CHANNELS)
    feats, plans = _unet_batch()
    params = model.init(
        jax.random.PRNGKey(69), feats[0],
        [jax.tree.map(lambda x: x[0], p) for p in plans],
    )
    values = batched_apply(model, params, feats, plans)
    dense = np.asarray(output_to_dense(values, plans[-1], SIZE))
    assert dense.shape == (2, SIZE, SIZE)
    for b in range(2):
        l = dense[b]
        assert np.all(np.diag(l) > 0)
        assert np.all(np.triu(l, 1) == 0)
        m = (l @ l.T).astype(np.float64)
        eig = np.linalg.eigvalsh(m)
        assert eig.min() > 0


def test_unet_gradients():
    model = PreconditionerSparseUNet(channels=CHANNELS)
    feats, plans = _unet_batch()
    sample_plans = [jax.tree.map(lambda x: x[0], p) for p in plans]
    params = model.init(jax.random.PRNGKey(0), feats[0], sample_plans)

    def loss_fn(p):
        out = model.apply(p, feats[0], sample_plans)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(np.any(np.asarray(g) != 0) for g in leaves)
