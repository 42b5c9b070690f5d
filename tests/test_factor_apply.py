"""factor_apply == dense (L L^T) @ r, including suite integration."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from deeppreconditioning_tpu.ops.factor_apply import (
    build_factor_apply_plan,
    factor_apply,
    pattern_widths,
)


def _random_tril_pattern(rng, n, density=0.1):
    mask = rng.random((n, n)) < density
    mask = np.tril(mask) | np.eye(n, dtype=bool)
    rows, cols = np.nonzero(mask)
    vals = rng.standard_normal(rows.shape[0])
    return rows.astype(np.int32), cols.astype(np.int32), vals


def test_factor_apply_matches_dense():
    rng = np.random.default_rng(0)
    n = 64
    rows, cols, vals = _random_tril_pattern(rng, n)
    # padding entries with valid=False and garbage coordinates
    pad = 17
    rows_p = np.concatenate([rows, np.zeros(pad, np.int32)])
    cols_p = np.concatenate([cols, np.zeros(pad, np.int32)])
    vals_p = np.concatenate([vals, np.zeros(pad)])
    valid = np.concatenate(
        [np.ones(rows.shape[0], bool), np.zeros(pad, bool)]
    )
    plan = build_factor_apply_plan(rows_p, cols_p, valid, n)
    r = rng.standard_normal(n)
    z = factor_apply(plan, jnp.asarray(vals_p), jnp.asarray(r))
    l_dense = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).toarray()
    expected = l_dense @ (l_dense.T @ r)
    np.testing.assert_allclose(np.asarray(z), expected, rtol=1e-10)


def test_factor_apply_wider_static_widths():
    """Dataset-global widths larger than the pattern's own maxima must
    give identical results (padding slots are inert)."""
    rng = np.random.default_rng(1)
    n = 32
    rows, cols, vals = _random_tril_pattern(rng, n, density=0.2)
    valid = np.ones(rows.shape[0], bool)
    w_l, w_u = pattern_widths(rows, cols, valid)
    plan = build_factor_apply_plan(
        rows, cols, valid, n, widths=(w_l + 5, w_u + 3)
    )
    r = rng.standard_normal(n)
    z = factor_apply(plan, jnp.asarray(vals), jnp.asarray(r))
    l_dense = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).toarray()
    np.testing.assert_allclose(
        np.asarray(z), l_dense @ (l_dense.T @ r), rtol=1e-10
    )


def test_width_overflow_raises():
    rows = np.zeros(3, np.int32)
    cols = np.arange(3, dtype=np.int32)
    valid = np.ones(3, bool)
    with pytest.raises(ValueError):
        build_factor_apply_plan(rows, cols, valid, 4, widths=(2, 1))


def test_suite_learned_factor_matches_dense_setup():
    """The factor-form learned apply must agree with the dense-M path the
    suite uses for kappa statistics."""
    from deeppreconditioning_tpu.bench.suite import (
        _learned_factor_values,
        _learned_setup_device,
    )
    from deeppreconditioning_tpu.data.datasets import RandomSPDDataSet
    from deeppreconditioning_tpu.models import (
        PreconditionerNet,
        precond_net_specs,
    )
    import jax

    channels = (1, 4, 8, 4, 1)
    specs = precond_net_specs(channels)
    ds = RandomSPDDataSet(
        "train", dof=24, batch_size=1, specs=specs, sparsity=0.8,
        length=2, seed=0, shuffle=False,
    )
    batch = ds[0]
    model = PreconditionerNet(channels=channels)
    sample_plans = [jax.tree.map(lambda x: x[0], p) for p in batch.plans]
    params = model.init(
        jax.random.PRNGKey(0), batch.features[0], sample_plans
    )
    n0 = jnp.int32(batch.original_sizes[0])
    m, _ = _learned_setup_device(
        model, params, batch.features, batch.plans, batch.scales, n0,
        dtype=jnp.float64,
    )
    vals = _learned_factor_values(
        model, params, batch.features, batch.plans, batch.scales, n0,
        dtype=jnp.float64,
    )
    fin = batch.plans[-1]
    plan = build_factor_apply_plan(
        np.asarray(fin.rows[0]), np.asarray(fin.cols[0]),
        np.asarray(fin.valid[0]), ds.dof_pad,
    )
    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.standard_normal(ds.dof_pad))
    z_factor = factor_apply(plan, vals, r)
    z_dense = m @ r
    # the dense path squares L in float32 before the cast; the factor
    # path multiplies after it — agreement is f32-level only
    np.testing.assert_allclose(
        np.asarray(z_factor), np.asarray(z_dense), rtol=1e-4, atol=1e-4
    )
