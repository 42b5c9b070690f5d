"""Numeric parity: f32 PCG tracks the f64 reference protocol."""

import jax.numpy as jnp
import numpy as np

from deeppreconditioning_tpu.data.fvm import generate_sludge_case
from deeppreconditioning_tpu.ops.ic0 import jacobi_preconditioner
from deeppreconditioning_tpu.solvers.cg import ell_matvec, pcg_with_history
from deeppreconditioning_tpu.sparse import ELLMatrix


def test_f32_iterations_match_f64_within_tolerance():
    rng = np.random.default_rng(11)
    case = generate_sludge_case(rng, mesh_cells=2)
    a = case.matrix.tocsr()
    n = a.shape[0]
    results = {}
    curves = {}
    for dtype in (jnp.float64, jnp.float32):
        ell = ELLMatrix.from_scipy(a, dtype=dtype)
        b = np.zeros(ell.n_pad)
        b[:n] = case.rhs
        d = np.zeros(ell.n_pad)
        d[:n] = jacobi_preconditioner(a)
        res, hist = pcg_with_history(
            ell_matvec, ell, jnp.asarray(b, dtype),
            lambda m, r: m * r, jnp.asarray(d, dtype),
        )
        results[dtype] = int(res.iterations)
        curves[dtype] = np.asarray(hist)
    delta = abs(results[jnp.float32] - results[jnp.float64])
    assert delta <= max(2, results[jnp.float64] // 20), results
    # curves agree over the common prefix (order of magnitude)
    k = min(results.values()) - 1
    ratio = curves[jnp.float32][:k] / curves[jnp.float64][:k]
    assert np.all(ratio < 10) and np.all(ratio > 0.1)
