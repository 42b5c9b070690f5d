"""Banded factor-form apply (ops/banded_factor.py) vs dense references."""

import jax.numpy as jnp
import numpy as np
import pytest

from deeppreconditioning_tpu.ops.banded_factor import (
    band_spread,
    banded_lower_matvec,
    banded_upper_matvec,
    extract_bands,
    make_banded_poly_apply,
)


def _random_banded_lower(rng, n, d):
    """Dense lower-triangular matrix with spread < d."""
    c = np.zeros((n, n))
    for j in range(n):
        hi = min(j + d, n)
        c[j:hi, j] = rng.standard_normal(hi - j)
    c[np.arange(n), np.arange(n)] = np.abs(c.diagonal()) + 1.0
    return c


def _bands_of(c, d):
    n = c.shape[0]
    bands = np.zeros((d, n))
    for off in range(d):
        bands[off, : n - off] = np.diagonal(c, -off)
    return bands


def test_banded_matvecs_match_dense():
    rng = np.random.default_rng(0)
    n, d = 96, 11
    c = _random_banded_lower(rng, n, d)
    bands = jnp.asarray(_bands_of(c, d))
    t = rng.standard_normal(n)
    r = rng.standard_normal(n)
    np.testing.assert_allclose(
        np.asarray(banded_lower_matvec(bands, jnp.asarray(t))),
        c @ t, rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(banded_upper_matvec(bands, jnp.asarray(r))),
        c.T @ r, rtol=1e-5, atol=1e-6,
    )


def test_banded_matvecs_batched():
    rng = np.random.default_rng(1)
    b, n, d = 3, 64, 7
    cs = np.stack([_random_banded_lower(rng, n, d) for _ in range(b)])
    bands = jnp.asarray(np.stack([_bands_of(c, d) for c in cs]))
    t = rng.standard_normal((b, n))
    expect_lo = np.einsum("bij,bj->bi", cs, t)
    expect_up = np.einsum("bji,bj->bi", cs, t)
    np.testing.assert_allclose(
        np.asarray(banded_lower_matvec(bands, jnp.asarray(t))),
        expect_lo, rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(banded_upper_matvec(bands, jnp.asarray(t))),
        expect_up, rtol=1e-5, atol=1e-6,
    )


def test_extract_bands_round_trip():
    """(out_rows, c_vals) plan layout -> bands -> dense equals direct."""
    rng = np.random.default_rng(2)
    n_pad, w, n0 = 32, 4, 27
    out_rows = np.full((n_pad, w), n_pad, np.int32)
    c_vals = np.zeros((n_pad, w), np.float32)
    dense = np.zeros((n_pad, n_pad))
    for j in range(n_pad):
        cands = np.arange(j, min(n_pad, j + 9))
        sel = np.sort(rng.choice(cands, min(w, cands.size), replace=False))
        sel[0] = j  # keep the diagonal
        out_rows[j, : sel.size] = sel
        vals = rng.standard_normal(sel.size).astype(np.float32)
        c_vals[j, : sel.size] = vals
        dense[sel, j] = vals
    d_isqrt = (1.0 / np.sqrt(rng.uniform(0.5, 2.0, n_pad))).astype(
        np.float32
    )
    d = band_spread(out_rows, n_pad)
    bands = np.asarray(extract_bands(
        jnp.asarray(out_rows), jnp.asarray(c_vals), d,
        d_isqrt=jnp.asarray(d_isqrt), n0=jnp.int32(n0),
    ))
    expect = d_isqrt[:, None] * dense
    expect[n0:, :] = 0.0
    expect[:, n0:] = 0.0
    np.testing.assert_allclose(
        bands, _bands_of(expect, d), rtol=1e-6, atol=1e-7
    )


@pytest.mark.parametrize("degree", [0, 1, 2])
def test_banded_poly_apply_matches_dense(degree):
    """z = C q(B) q(B)^T C^T r in band form vs the dense formula."""
    rng = np.random.default_rng(3)
    n, d = 48, 6
    c = _random_banded_lower(rng, n, d)
    bands = jnp.asarray(_bands_of(c, d)[None])  # batch of 1
    a = rng.standard_normal((n, n))
    a = a @ a.T + n * np.eye(n)
    q = rng.standard_normal(degree + 1) * 0.3
    q[0] = 1.0
    r = rng.standard_normal(n)

    bmat = c.T @ a @ c
    qb = sum(q[i] * np.linalg.matrix_power(bmat, i)
             for i in range(degree + 1))
    m = c @ qb @ qb.T @ c.T
    expect = m @ r

    def matvec(a_data, x):
        return jnp.einsum("ij,bj->bi", a_data, x)

    apply_fn = make_banded_poly_apply(matvec, degree)
    m_data = (bands, jnp.asarray(q[None]), jnp.asarray(a))
    got = np.asarray(apply_fn(m_data, jnp.asarray(r[None])))[0]
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=1e-5)
