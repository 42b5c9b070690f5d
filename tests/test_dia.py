"""DIA container + Pallas SpMV kernel tests (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from deeppreconditioning_tpu.sparse.dia import DIAMatrix, poisson_dia


def _poisson_2d_scipy(nx):
    ident = sp.eye(nx)
    t = sp.diags(
        [-np.ones(nx - 1), 2.0 * np.ones(nx), -np.ones(nx - 1)],
        [-1, 0, 1],
    )
    return (sp.kron(ident, t) + sp.kron(t, ident)).tocsr()


def test_dia_from_scipy_matvec():
    a = _poisson_2d_scipy(12)
    dia = DIAMatrix.from_scipy(a, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    x = np.zeros(dia.n_pad)
    x[: a.shape[0]] = rng.standard_normal(a.shape[0])
    y = np.asarray(dia.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y[: a.shape[0]], a @ x[: a.shape[0]],
                               rtol=1e-12)
    np.testing.assert_allclose(y[a.shape[0]:], 0.0, atol=1e-12)


def test_dia_to_dense():
    a = _poisson_2d_scipy(5)
    dia = DIAMatrix.from_scipy(a, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(dia.to_dense()), a.toarray(),
                               rtol=1e-12)


def test_poisson_dia_matches_scipy_2d():
    nx = 16
    built = poisson_dia((nx, nx), dtype=jnp.float64)
    ref = _poisson_2d_scipy(nx)
    np.testing.assert_allclose(np.asarray(built.to_dense()),
                               ref.toarray(), rtol=1e-12)


def test_poisson_dia_3d_structure():
    shape = (6, 5, 4)
    built = poisson_dia(shape, dtype=jnp.float64)
    dense = np.asarray(built.to_dense())
    np.testing.assert_allclose(dense, dense.T)
    assert (np.diag(dense) == 6.0).all()
    eig = np.linalg.eigvalsh(dense)
    assert eig.min() > 0


def test_pallas_dia_kernel_interpret():
    """Kernel correctness via the Pallas interpreter (no TPU needed)."""
    from jax.experimental import pallas as pl  # noqa: F401
    import deeppreconditioning_tpu.ops.pallas_spmv as ps

    a = poisson_dia((32, 32), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(a.n_pad), jnp.float32)

    # monkeypatch pallas_call to interpret mode
    orig = ps.pl.pallas_call
    ps.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        # tile=512 >= halo(32): rolling-window kernel (x traffic 1x)
        y_roll = np.asarray(ps.dia_matvec_pallas(a, x, tile=512))
        # tile=16 < halo: big-span fallback kernel
        y_span = np.asarray(ps.dia_matvec_pallas(a, x, tile=16))
        # 3-D offsets across several tile boundaries, auto tile pick
        a3 = poisson_dia((12, 12, 12), dtype=jnp.float32)
        x3 = jnp.asarray(
            np.random.default_rng(2).standard_normal(a3.n_pad),
            jnp.float32,
        )
        y3 = np.asarray(ps.dia_matvec_pallas(a3, x3))
    finally:
        ps.pl.pallas_call = orig
    y_ref = np.asarray(a.matvec(x))
    np.testing.assert_allclose(y_roll, y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y_span, y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        y3, np.asarray(a3.matvec(x3)), rtol=1e-5, atol=1e-5
    )


def test_dia_to_scipy_symmetric_and_matches_matvec():
    """to_scipy must reproduce the operator exactly (symmetric for
    Poisson) — sp.diags on the raw vals misaligns off-diagonals."""
    a = poisson_dia((5, 6, 7), dtype=jnp.float64)
    m = a.to_scipy()
    asym = abs(m - m.T)
    assert asym.nnz == 0 or asym.max() < 1e-14
    rng = np.random.default_rng(0)
    x = rng.standard_normal(a.n)
    xp = np.zeros(a.n_pad)
    xp[: a.n] = x
    y_dia = np.asarray(a.matvec(jnp.asarray(xp)))[: a.n]
    np.testing.assert_allclose(m @ x, y_dia, rtol=1e-12, atol=1e-12)
