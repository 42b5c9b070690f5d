"""Container + SpMV tests, including the reference's golden values."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from deeppreconditioning_tpu.sparse import BatchedCOO, CSRMatrix, ELLMatrix
from deeppreconditioning_tpu.sparse.coo import batched_coo_matvec


def _random_spd_scipy(n, rng, density=0.05):
    b = sp.random(n, n, density=density, random_state=rng)
    a = (b @ b.T + 10 * sp.eye(n)).tocoo()
    return a


def test_batched_coo_matvec_golden():
    """Golden values mirroring the reference fixture
    (/root/reference/tests/test_utils.py:11-41)."""
    indices = np.array(
        [
            [0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1], [0, 2, 2],
            [1, 0, 1], [1, 0, 2], [1, 1, 0], [1, 1, 1], [1, 2, 1],
        ],
        np.int32,
    )
    values = np.array([1, 2, 3, 4, 5, 2, 3, 1, 4, 5], float)
    coo = BatchedCOO.from_numpy(indices, values, 2, (3, 3), bucket=16)
    vectors = jnp.asarray(np.array([[1, 2, 3], [1, -1, 1]], float))

    result = batched_coo_matvec(coo, vectors, transpose=False)
    expected = np.array([[5, 11, 15], [1, -3, -5]], float)
    np.testing.assert_allclose(np.asarray(result), expected)


def test_batched_coo_matvec_transpose():
    indices = np.array([[0, 0, 1], [0, 1, 1], [0, 2, 0]], np.int32)
    values = np.array([2.0, 3.0, 4.0])
    coo = BatchedCOO.from_numpy(indices, values, 1, (3, 3), bucket=8)
    v = jnp.asarray(np.array([[1.0, 2.0, 3.0]]))
    dense = np.zeros((3, 3))
    dense[0, 1], dense[1, 1], dense[2, 0] = 2, 3, 4
    np.testing.assert_allclose(
        np.asarray(batched_coo_matvec(coo, v, transpose=True))[0],
        dense.T @ np.array([1.0, 2.0, 3.0]),
    )


def test_batched_coo_to_dense_roundtrip():
    rng = np.random.default_rng(0)
    n = 10
    a = _random_spd_scipy(n, rng, density=0.2)
    idx = np.column_stack(
        (np.zeros(a.nnz, np.int32), a.row, a.col)
    )
    coo = BatchedCOO.from_numpy(idx, a.data, 1, (n, n), bucket=64,
                                dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(coo.to_dense())[0], a.toarray(), rtol=1e-12
    )


def test_ell_matvec_vs_scipy():
    rng = np.random.default_rng(1)
    n = 50
    a = _random_spd_scipy(n, rng)
    ell = ELLMatrix.from_scipy(a, dtype=jnp.float64)
    x = rng.standard_normal(ell.n_pad)
    y = np.asarray(ell.matvec(jnp.asarray(x)))
    expected = a @ x[:n]
    np.testing.assert_allclose(y[:n], expected, rtol=1e-12)
    np.testing.assert_allclose(y[n:], 0.0)


def test_ell_to_dense():
    rng = np.random.default_rng(2)
    a = _random_spd_scipy(20, rng, density=0.1)
    ell = ELLMatrix.from_scipy(a, dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(ell.to_dense()), a.toarray(), rtol=1e-12
    )


def test_csr_matvec_vs_scipy():
    rng = np.random.default_rng(3)
    n = 40
    a = _random_spd_scipy(n, rng)
    csr = CSRMatrix.from_scipy(a, nnz_pad=a.nnz + 17, dtype=jnp.float64)
    x = rng.standard_normal(n)
    np.testing.assert_allclose(
        np.asarray(csr.matvec(jnp.asarray(x))), a @ x, rtol=1e-12
    )


def test_csr_scipy_roundtrip():
    rng = np.random.default_rng(4)
    a = _random_spd_scipy(15, rng, density=0.2).tocsr()
    csr = CSRMatrix.from_scipy(a, dtype=jnp.float64)
    back = csr.to_scipy()
    np.testing.assert_allclose(back.toarray(), a.toarray(), rtol=1e-12)
