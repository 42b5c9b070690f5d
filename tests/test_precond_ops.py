"""IC(0)/ICT factorization + level-scheduled triangular solve tests."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from deeppreconditioning_tpu.data.fvm import generate_sludge_case
from deeppreconditioning_tpu.ops.ic0 import (
    ic0_factor,
    ict_factor,
    jacobi_preconditioner,
    materialize_normal,
)
from deeppreconditioning_tpu.ops.trisolve import (
    build_tri_schedule,
    compute_levels,
    ic_apply,
    transpose_schedule,
    tri_solve_lower,
    tri_solve_upper_from_flipped,
)
from deeppreconditioning_tpu.solvers.cg import (
    conjugate_gradient,
    ell_matvec,
    preconditioned_conjugate_gradient,
)
from deeppreconditioning_tpu.sparse import ELLMatrix


def _fvm_matrix(seed=0, mesh_cells=1):
    rng = np.random.default_rng(seed)
    return generate_sludge_case(rng, mesh_cells=mesh_cells)


def test_ic0_pattern_and_residual():
    case = _fvm_matrix()
    a = case.matrix.tocsr()
    l = ic0_factor(a)
    # pattern of L == pattern of tril(A)
    tril = sp.tril(a, format="csr")
    assert (l.indptr == tril.indptr).all()
    assert (l.indices == tril.indices).all()
    # on the tril(A) pattern, (L L^T) matches A exactly (IC(0) property)
    m = (l @ l.T).toarray()
    ad = a.toarray()
    mask = tril.toarray() != 0
    np.testing.assert_allclose(m[mask], ad[mask], rtol=1e-10)


def test_ic0_exact_for_tridiagonal():
    """Tridiagonal SPD has no fill-in, so IC(0) == exact Cholesky."""
    n = 50
    a = sp.diags([-np.ones(n - 1), 2.5 * np.ones(n), -np.ones(n - 1)],
                 [-1, 0, 1]).tocsr()
    l = ic0_factor(a)
    np.testing.assert_allclose((l @ l.T).toarray(), a.toarray(),
                               rtol=1e-12)


def test_ict_factor_quality():
    case = _fvm_matrix(seed=1)
    a = case.matrix.tocsr()
    l = ict_factor(a, add_fill_in=2, threshold=0.01)
    m = (l @ l.T).toarray()
    # looser pattern -> better approximation than IC(0) in Fro norm
    l0 = ic0_factor(a)
    m0 = (l0 @ l0.T).toarray()
    ad = a.toarray()
    assert np.linalg.norm(m - ad) <= np.linalg.norm(m0 - ad) * 1.5


def test_levels_tridiag_sequential():
    n = 10
    a = sp.diags([-np.ones(n - 1), 2 * np.ones(n)], [-1, 0]).tocsr()
    levels = compute_levels(a)
    np.testing.assert_array_equal(levels, np.arange(n))


def test_tri_solve_matches_scipy():
    case = _fvm_matrix(seed=2)
    l = ic0_factor(case.matrix)
    n = l.shape[0]
    sched = build_tri_schedule(l)
    rng = np.random.default_rng(0)
    b = np.zeros(sched.n_pad)
    b[:n] = rng.standard_normal(n)
    x = np.asarray(tri_solve_lower(sched, jnp.asarray(b)))
    x_ref = sp.linalg.spsolve_triangular(l.tocsr(), b[:n], lower=True)
    np.testing.assert_allclose(x[:n], x_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(x[n:], 0.0)


def test_tri_solve_upper_matches_scipy():
    case = _fvm_matrix(seed=3)
    l = ic0_factor(case.matrix)
    n = l.shape[0]
    flipped = transpose_schedule(l)
    rng = np.random.default_rng(1)
    b = np.zeros(flipped.n_pad)
    b[:n] = rng.standard_normal(n)
    x = np.asarray(tri_solve_upper_from_flipped(flipped, jnp.asarray(b)))
    x_ref = sp.linalg.spsolve_triangular(l.T.tocsr(), b[:n], lower=False)
    np.testing.assert_allclose(x[:n], x_ref, rtol=1e-8, atol=1e-10)


def test_ic0_pcg_beats_vanilla_and_jacobi():
    """The IC(0) tri-solve preconditioner must cut CG iterations — the
    core claim the benchmark suite (and the learned preconditioner's
    bar) rests on."""
    case = _fvm_matrix(seed=4, mesh_cells=2)
    a = case.matrix.tocsr()
    n = a.shape[0]
    ell = ELLMatrix.from_scipy(a, dtype=jnp.float64)
    b = np.zeros(ell.n_pad)
    b[:n] = case.rhs

    plain = conjugate_gradient(ell_matvec, ell, jnp.asarray(b))

    d = np.zeros(ell.n_pad)
    d[:n] = jacobi_preconditioner(a)
    jac = preconditioned_conjugate_gradient(
        ell_matvec, ell, jnp.asarray(b),
        lambda m, r: m * r, jnp.asarray(d),
    )

    l = ic0_factor(a)
    lower = build_tri_schedule(l, n_pad=ell.n_pad)
    upper = transpose_schedule(l, n_pad=ell.n_pad)
    ic = preconditioned_conjugate_gradient(
        ell_matvec, ell, jnp.asarray(b),
        lambda md, r: ic_apply(md[0], md[1], r), (lower, upper),
    )

    assert int(ic.iterations) < int(jac.iterations) <= int(
        plain.iterations
    ) + 1, (
        f"ic={int(ic.iterations)} jac={int(jac.iterations)} "
        f"plain={int(plain.iterations)}"
    )
    assert float(ic.residual) < 1e-8


def test_materialize_normal_reference_semantics():
    case = _fvm_matrix(seed=5)
    l = ic0_factor(case.matrix)
    m = materialize_normal(l)
    np.testing.assert_allclose(m.toarray(), (l @ l.T).toarray(),
                               rtol=1e-12)
