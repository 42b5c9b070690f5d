"""Neumann triangular apply + distributed block-Jacobi IC tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from deeppreconditioning_tpu.data.fvm import generate_sludge_case
from deeppreconditioning_tpu.ops.ic0 import ic0_factor
from deeppreconditioning_tpu.ops.trisolve import (
    build_tri_neumann,
    compute_levels,
    neumann_ic_apply,
    neumann_lower_solve,
)
from deeppreconditioning_tpu.parallel.block_jacobi import (
    BlockJacobiIC,
    block_jacobi_apply,
    build_block_jacobi_ic,
)
from deeppreconditioning_tpu.parallel.partition import (
    pad_vector,
    shard_ell_rows,
)
from deeppreconditioning_tpu.parallel.pcg import make_mesh, pcg_sharded
from deeppreconditioning_tpu.solvers.cg import (
    conjugate_gradient,
    ell_matvec,
)
from deeppreconditioning_tpu.sparse import ELLMatrix


def _case(seed=0, mesh_cells=1):
    return generate_sludge_case(np.random.default_rng(seed),
                                mesh_cells=mesh_cells)


def test_neumann_exact_at_level_count():
    case = _case()
    l = ic0_factor(case.matrix)
    n = l.shape[0]
    levels = compute_levels(sp.tril(l.tocsr(), format="csr"))
    op = build_tri_neumann(l, sweeps=int(levels.max()) + 1)
    rng = np.random.default_rng(1)
    b = np.zeros(op.inv_diag.shape[0])
    b[:n] = rng.standard_normal(n)
    y = np.asarray(neumann_lower_solve(op, jnp.asarray(b)))
    y_ref = sp.linalg.spsolve_triangular(l.tocsr(), b[:n], lower=True)
    np.testing.assert_allclose(y[:n], y_ref, rtol=1e-8, atol=1e-9)


def test_neumann_truncated_is_spd():
    """Truncated Neumann apply must stay SPD (PCG safety)."""
    case = _case(seed=2)
    l = ic0_factor(case.matrix)
    n = l.shape[0]
    op = build_tri_neumann(l, sweeps=3)  # well below level count
    n_pad = op.inv_diag.shape[0]
    m = np.zeros((n, n))
    eye = np.eye(n_pad)
    for j in range(n):
        z = np.asarray(neumann_ic_apply(op, jnp.asarray(eye[j])))
        m[:, j] = z[:n]
    np.testing.assert_allclose(m, m.T, atol=1e-10)
    eig = np.linalg.eigvalsh(m)
    assert eig.min() > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_block_jacobi_distributed_pcg():
    """Block-Jacobi IC cuts iterations vs vanilla on the virtual mesh."""
    case = _case(seed=3, mesh_cells=2)
    a = case.matrix.tocsr()
    n = a.shape[0]
    ell = ELLMatrix.from_scipy(a, dtype=jnp.float64)
    sharded = shard_ell_rows(ell, 8)
    b = pad_vector(np.asarray(case.rhs), sharded.n_total)

    mesh = make_mesh(8)
    plain = pcg_sharded(mesh, sharded, jnp.asarray(b))

    bj = build_block_jacobi_ic(a, 8, sharded.n_total, sweeps=64)
    pre = pcg_sharded(
        mesh, sharded, jnp.asarray(b),
        m_data=bj, apply_m=block_jacobi_apply,
    )
    assert float(pre.residual) < 1e-8
    assert int(pre.iterations) < int(plain.iterations), (
        f"block-jacobi {int(pre.iterations)} vs plain "
        f"{int(plain.iterations)}"
    )
    x = np.asarray(pre.x)[:n]
    resid = np.linalg.norm(a @ x - case.rhs) / np.linalg.norm(case.rhs)
    assert resid < 1e-3
