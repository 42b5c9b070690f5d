"""FVM pressure-Poisson generator tests (SPD class + reference format)."""

import numpy as np
import scipy.sparse as sp

from deeppreconditioning_tpu.data.fvm import (
    FVMCase,
    assemble_pressure_poisson,
    generate_sludge_case,
    save_case,
)


def test_assembly_spd_and_stencil():
    rng = np.random.default_rng(0)
    ny, nx = 12, 10
    rho = np.where(rng.uniform(size=(ny, nx)) > 0.5, 1000.0, 1400.0)
    a, _ = assemble_pressure_poisson(ny, nx, rho)
    dense = a.toarray()
    np.testing.assert_allclose(dense, dense.T, atol=1e-15)
    eig = np.linalg.eigvalsh(dense)
    assert eig.min() > 0, "assembled matrix must be SPD"
    # 5-point stencil: at most 5 nnz per row
    row_nnz = np.diff(a.tocsr().indptr)
    assert row_nnz.max() <= 5
    # M-matrix: negative off-diagonals, positive diagonal
    offdiag = a.toarray() - np.diag(a.diagonal())
    assert (a.diagonal() > 0).all()
    assert (offdiag <= 0).all()


def test_generate_case_ground_truth():
    rng = np.random.default_rng(42)
    case = generate_sludge_case(rng, mesh_cells=1)
    a = case.matrix.tocsr()
    n = a.shape[0]
    assert n <= 2000  # snappy cell cap parity
    res = np.linalg.norm(a @ case.solution - case.rhs)
    assert res < 2e-6, f"ground-truth residual {res}"


def test_save_case_reference_layout(tmp_path):
    """On-disk layout is unpackable exactly like data_set.py:85."""
    rng = np.random.default_rng(7)
    case = generate_sludge_case(rng, mesh_cells=1)
    save_case(case, tmp_path / "case_0000")
    z = np.load(tmp_path / "case_0000" / "matrix.npz")
    rows, columns, _, original_size, values = z.values()
    assert original_size[0] == case.matrix.shape[0]
    m = sp.coo_matrix(
        (values, (rows, columns)), shape=tuple(original_size)
    )
    np.testing.assert_allclose(
        m.toarray(), case.matrix.toarray(), rtol=1e-12
    )
    sol = np.loadtxt(tmp_path / "case_0000" / "solution.csv")
    rhs = np.loadtxt(tmp_path / "case_0000" / "right_hand_side.csv")
    np.testing.assert_allclose(sol, case.solution)
    np.testing.assert_allclose(rhs, case.rhs)


def test_case_size_jitter():
    rng = np.random.default_rng(5)
    sizes = {generate_sludge_case(rng, mesh_cells=1).matrix.shape[0]
             for _ in range(4)}
    assert len(sizes) > 1, "cases should vary in dof like snappy meshes"
