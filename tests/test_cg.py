"""CG / PCG solver tests against scipy and the reference protocol."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from deeppreconditioning_tpu.sparse import ELLMatrix
from deeppreconditioning_tpu.solvers.cg import (
    CGResult,
    conjugate_gradient,
    dense_matvec,
    ell_matvec,
    pcg_with_history,
    preconditioned_conjugate_gradient,
)


def _poisson_1d(n):
    return sp.diags(
        [-np.ones(n - 1), 2 * np.ones(n), -np.ones(n - 1)], [-1, 0, 1]
    ).tocsr()


def test_cg_matches_scipy_solution():
    n = 64
    a = _poisson_1d(n)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)
    res = conjugate_gradient(dense_matvec, jnp.asarray(a.toarray()),
                             jnp.asarray(b))
    x_ref = sp.linalg.spsolve(a.tocsc(), b)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-5,
                               atol=1e-8)
    # stopping criterion is the squared relative residual (cg.py:15-17)
    r = b - a @ np.asarray(res.x)
    assert np.dot(r, r) / np.dot(b, b) < 1e-8


def test_cg_iteration_count_tridiag_exact():
    """CG on an n-dim system converges in at most n iterations."""
    n = 32
    a = _poisson_1d(n)
    b = np.ones(n)
    res = conjugate_gradient(dense_matvec, jnp.asarray(a.toarray()),
                             jnp.asarray(b))
    assert int(res.iterations) <= n


def test_pcg_jacobi_reduces_iterations():
    rng = np.random.default_rng(1)
    n = 128
    # badly scaled SPD system: Jacobi should help a lot
    d = 10.0 ** rng.uniform(-2, 2, n)
    a = _poisson_1d(n).toarray() + np.diag(d)
    b = rng.standard_normal(n)
    plain = conjugate_gradient(dense_matvec, jnp.asarray(a), jnp.asarray(b))
    m = np.diag(1.0 / np.diag(a))
    pre = preconditioned_conjugate_gradient(
        dense_matvec, jnp.asarray(a), jnp.asarray(b),
        dense_matvec, jnp.asarray(m),
    )
    assert int(pre.iterations) < int(plain.iterations)
    r = b - a @ np.asarray(pre.x)
    assert np.dot(r, r) / np.dot(b, b) < 1e-8


def test_pcg_exact_inverse_one_iteration():
    """With M = A^-1 PCG converges in one iteration."""
    rng = np.random.default_rng(2)
    n = 16
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = q @ np.diag(rng.uniform(1, 10, n)) @ q.T
    b = rng.standard_normal(n)
    res = preconditioned_conjugate_gradient(
        dense_matvec, jnp.asarray(a), jnp.asarray(b),
        dense_matvec, jnp.asarray(np.linalg.inv(a)),
    )
    assert int(res.iterations) <= 2


def test_pcg_ell_matvec():
    n = 100
    a = _poisson_1d(n)
    ell = ELLMatrix.from_scipy(a, dtype=jnp.float64)
    b = np.zeros(ell.n_pad)
    b[:n] = 1.0
    res = preconditioned_conjugate_gradient(
        ell_matvec, ell, jnp.asarray(b)
    )
    x_ref = sp.linalg.spsolve(a.tocsc(), b[:n])
    np.testing.assert_allclose(np.asarray(res.x)[:n], x_ref, rtol=1e-4,
                               atol=1e-7)


def test_pcg_history_monotone_tail_and_iterations_match():
    n = 64
    a = _poisson_1d(n).toarray()
    rng = np.random.default_rng(3)
    b = rng.standard_normal(n)
    res, history = pcg_with_history(
        dense_matvec, jnp.asarray(a), jnp.asarray(b), max_iter=256
    )
    res2 = conjugate_gradient(dense_matvec, jnp.asarray(a), jnp.asarray(b),
                              max_iter=256)
    assert int(res.iterations) == int(res2.iterations)
    h = np.asarray(history)
    k = int(res.iterations)
    assert h[k - 1] < 1e-8
    # history is frozen after convergence
    np.testing.assert_allclose(h[k - 1:], h[k - 1])


def test_cg_max_iter_cap():
    """The loop respects the 1024-iteration cap (cg.py:20)."""
    rng = np.random.default_rng(4)
    n = 48
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = q @ np.diag(np.geomspace(1e-8, 1, n)) @ q.T  # horribly conditioned
    b = rng.standard_normal(n)
    res = conjugate_gradient(dense_matvec, jnp.asarray(a), jnp.asarray(b),
                             max_iter=10)
    assert int(res.iterations) <= 10
    assert isinstance(res, CGResult)
