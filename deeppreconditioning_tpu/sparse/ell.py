"""ELLPACK sparse matrix — the TPU-preferred SpMV layout.

FVM pressure-Poisson matrices have a near-uniform ~5-7 nnz per row, so
padding each row to a fixed slot count wastes little and buys fully static,
vectorizable shapes: SpMV becomes `gather + multiply + row-sum`, which XLA
maps onto the VPU with one gather, and which the Pallas kernel in
ops/spmv.py streams at HBM bandwidth.

Sentinel convention: empty slots store column index `n` (one past the end)
with value 0; `x` is padded with one trailing zero so gathers stay in
bounds without masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class ELLMatrix:
    """Square sparse matrix in padded ELLPACK format.

    Attributes:
        cols: int32 (n_pad, k) — column index per slot; sentinel = n_pad.
        vals: float (n_pad, k) — entry values; 0 in empty slots.
        n: static int — true dimension (rows beyond n are all-sentinel).
    """

    cols: jax.Array
    vals: jax.Array
    n: int = struct.field(pytree_node=False)

    @property
    def n_pad(self) -> int:
        return self.cols.shape[0]

    @property
    def k(self) -> int:
        return self.cols.shape[1]

    @property
    def nnz(self) -> jax.Array:
        return jnp.sum(self.cols != self.n_pad)

    def matvec(self, x: jax.Array) -> jax.Array:
        """y = A @ x via gather + row-sum. x has shape (n_pad,)."""
        x_ext = jnp.concatenate([x, jnp.zeros((1,), x.dtype)])
        gathered = x_ext[self.cols]
        return jnp.sum(self.vals * gathered, axis=1)

    def to_dense(self) -> jax.Array:
        rows = jnp.broadcast_to(
            jnp.arange(self.n_pad)[:, None], self.cols.shape
        )
        out = jnp.zeros((self.n_pad, self.n_pad + 1), self.vals.dtype)
        out = out.at[rows, self.cols].add(self.vals)
        return out[: self.n, : self.n]

    @staticmethod
    def from_coo(
        rows: np.ndarray,
        cols: np.ndarray,
        vals: np.ndarray,
        n: int,
        n_pad: int | None = None,
        k: int | None = None,
        dtype=jnp.float32,
    ) -> "ELLMatrix":
        """Build from host COO triplets (duplicates summed)."""
        import scipy.sparse as sp

        csr = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
        csr.sum_duplicates()
        row_nnz = np.diff(csr.indptr)
        kmax = int(row_nnz.max()) if n else 1
        if k is None:
            k = max(kmax, 1)
        else:
            assert k >= kmax, f"k={k} < max row nnz {kmax}"
        if n_pad is None:
            n_pad = ((n + 7) // 8) * 8
        assert n_pad >= n
        ell_cols = np.full((n_pad, k), n_pad, np.int32)
        ell_vals = np.zeros((n_pad, k), np.float64)
        for i in range(n):
            lo, hi = csr.indptr[i], csr.indptr[i + 1]
            ell_cols[i, : hi - lo] = csr.indices[lo:hi]
            ell_vals[i, : hi - lo] = csr.data[lo:hi]
        return ELLMatrix(
            cols=jnp.asarray(ell_cols),
            vals=jnp.asarray(ell_vals, dtype=dtype),
            n=n,
        )

    @staticmethod
    def from_scipy(mat, n_pad: int | None = None, k: int | None = None,
                   dtype=jnp.float32) -> "ELLMatrix":
        coo = mat.tocoo()
        return ELLMatrix.from_coo(
            coo.row, coo.col, coo.data, mat.shape[0], n_pad=n_pad, k=k,
            dtype=dtype,
        )
