"""Algebraic multigrid preconditioner — TPU-native aggregation AMG.

Replaces the reference's pyamg smoothed-aggregation baseline
(test.py:95-98, disabled there: the dense-materialized V-cycle was too
slow).  This is a two-level aggregation AMG engineered for XLA:

  * setup (host): greedy strength-of-connection aggregation over the
    scipy matrix; piecewise-constant prolongation P; dense factorized
    coarse operator A_c = P^T A P.
  * apply (device): one V(1,1)-cycle as pure vector ops —
    weighted-Jacobi pre-smooth, coarse correction, Jacobi post-smooth.
    Piecewise-constant P makes restriction a segment-sum by aggregate id
    and prolongation a gather — no sparse matrices on device at all.

The apply is a fixed linear operation; with symmetric smoothing it is a
valid (SPSD-symmetrized) PCG preconditioner.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from flax import struct

from deeppreconditioning_tpu.sparse.ell import ELLMatrix


@struct.dataclass
class AMGPreconditioner:
    """Two-level aggregation AMG operator (device pytree).

    Attributes:
        agg: int32 (n_pad,) aggregate id per fine node (nc for padding).
        inv_diag: (n_pad,) weighted-Jacobi inverse diagonal (0 padding).
        coarse_inv: (nc_pad, nc_pad) dense inverse of A_c.
        ell: fine-level operator for smoothing residuals.
        omega: static Jacobi damping.
    """

    agg: jax.Array
    inv_diag: jax.Array
    coarse_inv: jax.Array
    ell: ELLMatrix
    omega: float = struct.field(pytree_node=False)

    @property
    def nc_pad(self) -> int:
        return self.coarse_inv.shape[0]


def _aggregate(a: sp.csr_matrix, theta: float = 0.08) -> np.ndarray:
    """Greedy strength-based aggregation (standard SA first pass +
    neighbor sweep-in)."""
    n = a.shape[0]
    diag = a.diagonal()
    agg = np.full(n, -1, np.int64)
    strong = [[] for _ in range(n)]
    coo = a.tocoo()
    for i, j, v in zip(coo.row, coo.col, coo.data):
        if i != j and v * v >= theta * theta * abs(
            diag[i] * diag[j]
        ):
            strong[i].append(j)
    nc = 0
    # pass 1: seed aggregates on untouched nodes
    for i in range(n):
        if agg[i] != -1:
            continue
        if all(agg[j] == -1 for j in strong[i]):
            agg[i] = nc
            for j in strong[i]:
                agg[j] = nc
            nc += 1
    # pass 2: attach leftovers to a neighboring aggregate
    for i in range(n):
        if agg[i] == -1:
            for j in strong[i]:
                if agg[j] != -1:
                    agg[i] = agg[j]
                    break
            if agg[i] == -1:
                agg[i] = nc
                nc += 1
    return agg, nc


def build_amg(a: sp.spmatrix, n_pad: int | None = None,
              omega: float = 0.67, theta: float = 0.08,
              dtype=jnp.float32) -> AMGPreconditioner:
    """Two-level setup from a scipy SPD matrix (host)."""
    csr = a.tocsr()
    n = csr.shape[0]
    if n_pad is None:
        n_pad = ((n + 7) // 8) * 8
    agg, nc = _aggregate(csr, theta)
    nc_pad = ((nc + 7) // 8) * 8

    p = sp.coo_matrix(
        (np.ones(n), (np.arange(n), agg)), shape=(n, nc)
    ).tocsr()
    a_c = (p.T @ csr @ p).toarray()
    coarse_inv = np.zeros((nc_pad, nc_pad))
    coarse_inv[:nc, :nc] = np.linalg.inv(a_c)

    agg_pad = np.full(n_pad, nc_pad, np.int32)
    agg_pad[:n] = agg
    inv_diag = np.zeros(n_pad)
    inv_diag[:n] = 1.0 / csr.diagonal()

    ell = ELLMatrix.from_scipy(csr, n_pad=n_pad, dtype=dtype)
    return AMGPreconditioner(
        agg=jnp.asarray(agg_pad),
        inv_diag=jnp.asarray(inv_diag, dtype),
        coarse_inv=jnp.asarray(coarse_inv, dtype),
        ell=ell,
        omega=omega,
    )


def amg_apply(m: AMGPreconditioner, r: jax.Array) -> jax.Array:
    """One symmetric V(1,1)-cycle: z ~ A^-1 r (call as PCG apply)."""
    omega = m.omega
    # pre-smooth: x1 = omega D^-1 r
    x = omega * m.inv_diag * r
    # coarse correction on the residual
    res = r - m.ell.matvec(x)
    rc = jax.ops.segment_sum(res, m.agg, num_segments=m.nc_pad + 1)[:-1]
    yc = m.coarse_inv @ rc
    yc_ext = jnp.concatenate([yc, jnp.zeros((1,), yc.dtype)])
    x = x + yc_ext[m.agg]
    # post-smooth (symmetric): x += omega D^-1 (r - A x)
    x = x + omega * m.inv_diag * (r - m.ell.matvec(x))
    return x
