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
