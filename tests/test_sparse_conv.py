"""Sparse-conv engine tests: gather-GEMM vs dense reference convolution."""

import jax.numpy as jnp
import numpy as np

from deeppreconditioning_tpu.ops.sparse_conv import (
    ConvSpec,
    apply_sparse_conv,
    build_sample_plan,
    pad_sample_plans,
)


def _dense_conv(img, w, spec):
    """Reference dense convolution, conv-layer semantics (stride 1).

    img: (H, W, Cin); w: (kh*kw, Cin, Cout).  out(i,j) =
    sum_{ki,kj} img(i - ph + ki, j - pw + kj) @ w[ki*kw+kj].
    """
    kh, kw = spec.kernel
    ph, pw = spec.padding
    h, wdt, cin = img.shape
    ho, wo = spec.out_shape((h, wdt))
    cout = w.shape[2]
    out = np.zeros((ho, wo, cout))
    for i in range(ho):
        for j in range(wo):
            for ki in range(kh):
                for kj in range(kw):
                    ri, ci = i - ph + ki, j - pw + kj
                    if 0 <= ri < h and 0 <= ci < wdt:
                        out[i, j] += img[ri, ci] @ w[ki * kw + kj]
    return out


def _random_sparse_sites(rng, h, w, nnz):
    lin = rng.choice(h * w, size=nnz, replace=False)
    return (lin // w).astype(np.int32), (lin % w).astype(np.int32)


def test_conv_k2_asymmetric_padding_matches_dense():
    rng = np.random.default_rng(0)
    h = w = 12
    cin, cout = 3, 5
    rows, cols = _random_sparse_sites(rng, h, w, 30)
    feats = rng.standard_normal((30, cin))

    for padding in [(1, 0), (0, 1), (1, 1)]:
        spec = ConvSpec((2, 2), padding)
        plan_host = build_sample_plan(rows, cols, (h, w), [spec])
        [plan_layers] = pad_sample_plans([plan_host], [32], bucket=32)
        plan = plan_layers[0]

        weights = rng.standard_normal((4, cin, cout))
        f_pad = np.zeros((32, cin))
        f_pad[:30] = feats
        out = np.asarray(
            apply_sparse_conv(
                jnp.asarray(f_pad), plan, jnp.asarray(weights), None
            )
        )

        img = np.zeros((h, w, cin))
        img[rows, cols] = feats
        dense = _dense_conv(img, weights, spec)

        # scatter sparse output and compare against dense everywhere
        ho, wo = spec.out_shape((h, w))
        sparse_dense = np.zeros((ho, wo, cout))
        prow = np.asarray(plan.rows)
        pcol = np.asarray(plan.cols)
        val = np.asarray(plan.valid)
        sparse_dense[prow[val], pcol[val]] = out[val]
        np.testing.assert_allclose(sparse_dense, dense, atol=1e-12)


def test_conv_k1_identity_pattern():
    rng = np.random.default_rng(1)
    h = w = 8
    rows, cols = _random_sparse_sites(rng, h, w, 10)
    feats = rng.standard_normal((10, 2))
    spec = ConvSpec((1, 1), (0, 0))
    plan_host = build_sample_plan(rows, cols, (h, w), [spec])
    [plan_layers] = pad_sample_plans([plan_host], [16], bucket=16)
    plan = plan_layers[0]
    weights = rng.standard_normal((1, 2, 4))
    bias = rng.standard_normal(4)
    f_pad = np.zeros((16, 2))
    f_pad[:10] = feats
    out = np.asarray(
        apply_sparse_conv(jnp.asarray(f_pad), plan, jnp.asarray(weights),
                          jnp.asarray(bias))
    )
    # k=1 keeps the active set; sites preserved in original order
    np.testing.assert_allclose(out[:10], feats @ weights[0] + bias,
                               atol=1e-12)
    np.testing.assert_allclose(out[10:], 0.0)


def test_active_set_dilation():
    """k=2 ordinary conv dilates the active set like spconv SparseConv2d."""
    rows = np.array([5], np.int32)
    cols = np.array([5], np.int32)
    spec = ConvSpec((2, 2), (1, 0))
    plan_host = build_sample_plan(rows, cols, (12, 12), [spec])
    r, c = plan_host.layer_rows[0], plan_host.layer_cols[0]
    got = set(zip(r.tolist(), c.tolist()))
    # out(i,j) <- in(i-1+ki, j+kj): site (5,5) contributes to
    # i in {5,6}, j in {4,5}
    assert got == {(5, 4), (5, 5), (6, 4), (6, 5)}


def test_chained_plan_shapes_restore():
    """The reference's 4 k=2 layers restore the spatial shape
    (model.py:33-37: two (1,0) pads then two (0,1) pads)."""
    rng = np.random.default_rng(2)
    h = w = 16
    rows, cols = _random_sparse_sites(rng, h, w, 20)
    specs = [
        ConvSpec((2, 2), (1, 0)), ConvSpec((2, 2), (1, 0)),
        ConvSpec((2, 2), (0, 1)), ConvSpec((2, 2), (0, 1)),
    ]
    plan = build_sample_plan(rows, cols, (h, w), specs)
    assert plan.shapes[-1] == (h, w)
    assert plan.shapes[1] == (h + 1, w - 1)
    assert plan.shapes[2] == (h + 2, w - 2)
