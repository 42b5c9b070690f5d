"""Aggregation AMG preconditioner tests."""

import jax.numpy as jnp
import numpy as np

from deeppreconditioning_tpu.data.fvm import generate_sludge_case
from deeppreconditioning_tpu.ops.amg import amg_apply, build_amg
from deeppreconditioning_tpu.solvers.cg import (
    conjugate_gradient,
    ell_matvec,
    preconditioned_conjugate_gradient,
)
from deeppreconditioning_tpu.sparse import ELLMatrix


def test_amg_apply_symmetric():
    case = generate_sludge_case(np.random.default_rng(0), mesh_cells=1)
    a = case.matrix.tocsr()
    n = a.shape[0]
    m = build_amg(a, dtype=jnp.float64)
    n_pad = m.inv_diag.shape[0]
    # operator matrix of the apply must be symmetric (PCG requirement)
    cols = np.zeros((n, n))
    eye = np.eye(n_pad)
    for j in range(n):
        cols[:, j] = np.asarray(amg_apply(m, jnp.asarray(eye[j])))[:n]
    np.testing.assert_allclose(cols, cols.T, atol=1e-9)


def _poisson2d(nx):
    import scipy.sparse as sp

    eye = sp.identity(nx)
    t = sp.diags([-1, 2, -1], [-1, 0, 1], shape=(nx, nx))
    return (sp.kron(eye, t) + sp.kron(t, eye)).tocsr()


def test_amg_multilevel_hierarchy_and_convergence():
    """Recursive aggregation reaches the coarse target through several
    levels; the default (smoothed-P) deep V-cycle matches or beats a
    two-level UNSMOOTHED cycle with exact coarse solve, and the
    piecewise-constant deep cycle stays within the known unsmoothed-
    aggregation degradation factor."""
    a = _poisson2d(48)  # n = 2304
    n = a.shape[0]
    ell = ELLMatrix.from_scipy(a, dtype=jnp.float64)
    b = np.zeros(ell.n_pad)
    b[:n] = 1.0

    def iters(**kw):
        m = build_amg(a, n_pad=ell.n_pad, dtype=jnp.float64, **kw)
        res = preconditioned_conjugate_gradient(
            ell_matvec, ell, jnp.asarray(b), amg_apply, m,
        )
        assert float(res.residual) < 1e-8
        return int(res.iterations), m

    deep_s, m_deep = iters(coarse_target=64)
    assert len(m_deep.levels) >= 2, len(m_deep.levels)
    assert m_deep.coarse_inv.shape[0] <= 128

    two_u, m_two = iters(coarse_target=n, smooth_prolongation=False)
    assert len(m_two.levels) == 1
    # smoothed multilevel must not lose to the exact-coarse unsmoothed
    # two-level (measured 8 vs 10)
    assert deep_s <= two_u, (deep_s, two_u)

    deep_u, _ = iters(coarse_target=64, smooth_prolongation=False)
    assert deep_u <= int(two_u * 2.5), (deep_u, two_u)


def test_amg_smoothed_prolongation_symmetric_and_converges():
    a = _poisson2d(32)
    n = a.shape[0]
    m = build_amg(a, dtype=jnp.float64, coarse_target=64,
                  smooth_prolongation=True)
    assert len(m.levels) >= 2
    n_pad = m.inv_diag.shape[0]
    cols = np.zeros((n, n))
    eye = np.eye(n_pad)
    for j in range(n):
        cols[:, j] = np.asarray(amg_apply(m, jnp.asarray(eye[j])))[:n]
    np.testing.assert_allclose(cols, cols.T, atol=1e-9)

    ell = ELLMatrix.from_scipy(a, dtype=jnp.float64)
    b = np.zeros(ell.n_pad)
    b[:n] = 1.0
    plain = conjugate_gradient(ell_matvec, ell, jnp.asarray(b))
    pre = preconditioned_conjugate_gradient(
        ell_matvec, ell, jnp.asarray(b), amg_apply, m,
    )
    assert float(pre.residual) < 1e-8
    assert int(pre.iterations) < int(plain.iterations) // 3


def test_amg_scales_iteration_counts():
    """Mesh-independence signature: iterations grow slowly with n
    (Poisson family, fixed coarse target)."""
    iters = []
    for nx in (16, 32, 64):
        a = _poisson2d(nx)
        n = a.shape[0]
        ell = ELLMatrix.from_scipy(a, dtype=jnp.float64)
        b = np.zeros(ell.n_pad)
        b[:n] = 1.0
        m = build_amg(a, n_pad=ell.n_pad, dtype=jnp.float64,
                      coarse_target=64)
        res = preconditioned_conjugate_gradient(
            ell_matvec, ell, jnp.asarray(b), amg_apply, m,
        )
        assert float(res.residual) < 1e-8
        iters.append(int(res.iterations))
    # 16x the unknowns from 16^2 to 64^2: far slower than sqrt growth
    assert iters[2] <= iters[0] * 3, iters


def test_amg_pcg_beats_jacobi():
    case = generate_sludge_case(np.random.default_rng(1), mesh_cells=2)
    a = case.matrix.tocsr()
    n = a.shape[0]
    ell = ELLMatrix.from_scipy(a, dtype=jnp.float64)
    b = np.zeros(ell.n_pad)
    b[:n] = case.rhs

    plain = conjugate_gradient(ell_matvec, ell, jnp.asarray(b))
    m = build_amg(a, n_pad=ell.n_pad, dtype=jnp.float64)
    pre = preconditioned_conjugate_gradient(
        ell_matvec, ell, jnp.asarray(b), amg_apply, m,
    )
    assert float(pre.residual) < 1e-8
    assert int(pre.iterations) < int(plain.iterations) // 2, (
        f"amg={int(pre.iterations)} plain={int(plain.iterations)}"
    )
    x = np.asarray(pre.x)[:n]
    resid = np.linalg.norm(a @ x - case.rhs) / np.linalg.norm(case.rhs)
    assert resid < 1e-3
