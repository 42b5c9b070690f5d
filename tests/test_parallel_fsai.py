"""Distributed FSAI / polynomial-FSAI preconditioned PCG tests
(parallel/fsai.py) on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppreconditioning_tpu.data.fvm import generate_sludge_case
from deeppreconditioning_tpu.ops.fsai import (
    fsai_factor_scipy,
    tril_power_pattern,
)
from deeppreconditioning_tpu.parallel.fsai import (
    build_sharded_fsai,
    make_fsai_poly_sharded_apply,
    make_fsai_sharded_apply,
)
from deeppreconditioning_tpu.parallel.partition import (
    pad_vector,
    shard_ell_rows,
)
from deeppreconditioning_tpu.parallel.pcg import make_mesh, pcg_sharded
from deeppreconditioning_tpu.solvers.cg import (
    dense_matvec,
    ell_matvec,
    preconditioned_conjugate_gradient,
)
from deeppreconditioning_tpu.sparse import ELLMatrix

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _fsai_setup(power=2):
    rng = np.random.default_rng(11)
    case = generate_sludge_case(rng, mesh_cells=2)
    a = case.matrix.tocsr()
    n = a.shape[0]
    pr, pc = tril_power_pattern(
        *[x.astype(np.int32) for x in np.tril(a.toarray()).nonzero()],
        n, power=power,
    )
    c_sp = fsai_factor_scipy(a, pr, pc).tocsc()
    return case, a, n, c_sp


def _pack_columns(c_sp, n_pad):
    """scipy CSC factor -> (n_pad, w) out_rows / c_vals arrays."""
    w = int(np.diff(c_sp.indptr).max())
    out_rows = np.full((n_pad, w), n_pad, np.int32)
    c_vals = np.zeros((n_pad, w))
    for j in range(c_sp.shape[1]):
        lo, hi = c_sp.indptr[j], c_sp.indptr[j + 1]
        idx = c_sp.indices[lo:hi]
        out_rows[j, : idx.shape[0]] = idx
        c_vals[j, : idx.shape[0]] = c_sp.data[lo:hi]
    return out_rows, c_vals


def test_sharded_fsai_pcg_matches_dense_apply():
    """Exact global FSAI over 8 shards == dense M = C C^T apply: same
    solution, same iteration count (modulo reduction order)."""
    case, a, n, c_sp = _fsai_setup()
    ell = ELLMatrix.from_scipy(a, dtype=jnp.float64)
    b = np.zeros(ell.n_pad)
    b[:n] = case.rhs

    m_dense = np.zeros((ell.n_pad, ell.n_pad))
    m_dense[:n, :n] = (c_sp @ c_sp.T).toarray()
    single = preconditioned_conjugate_gradient(
        ell_matvec, ell, jnp.asarray(b),
        dense_matvec, jnp.asarray(m_dense),
    )

    mesh = make_mesh(8)
    sharded = shard_ell_rows(ell, 8)
    out_rows, c_vals = _pack_columns(c_sp, ell.n_pad)
    sf = build_sharded_fsai(out_rows, c_vals, 8, n_total=sharded.n_total)
    m_data = {"u_pos": sf.u_pos, "u_vals": sf.u_vals,
              "l_pos": sf.l_pos, "l_vals": sf.l_vals}
    dist = pcg_sharded(
        mesh, sharded, jnp.asarray(pad_vector(b, sharded.n_total)),
        m_data=m_data, apply_m=make_fsai_sharded_apply(sf.halo),
        mode="halo",
    )
    assert abs(int(dist.iterations) - int(single.iterations)) <= 2, (
        int(dist.iterations), int(single.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(dist.x)[:n], np.asarray(single.x)[:n],
        rtol=1e-5, atol=1e-8,
    )
    assert float(dist.residual) < 1e-8


def test_sharded_poly_fsai_pcg_matches_dense():
    """Polynomial-wrapped flagship apply z = C q(B) q(B)^T C^T r over 8
    shards == its dense materialization (neighbor-only comms)."""
    case, a, n, c_sp = _fsai_setup()
    ell = ELLMatrix.from_scipy(a, dtype=jnp.float64)
    b = np.zeros(ell.n_pad)
    b[:n] = case.rhs
    q = np.array([0.9, 0.05])

    c_d = c_sp.toarray()
    bmat = c_d.T @ a.toarray() @ c_d
    qb = q[0] * np.eye(n) + q[1] * bmat
    m_dense = np.zeros((ell.n_pad, ell.n_pad))
    m_dense[:n, :n] = c_d @ qb @ qb.T @ c_d.T
    single = preconditioned_conjugate_gradient(
        ell_matvec, ell, jnp.asarray(b),
        dense_matvec, jnp.asarray(m_dense),
    )

    mesh = make_mesh(8)
    sharded = shard_ell_rows(ell, 8)
    out_rows, c_vals = _pack_columns(c_sp, ell.n_pad)
    sf = build_sharded_fsai(out_rows, c_vals, 8, n_total=sharded.n_total)
    m_data = {
        "u_pos": sf.u_pos, "u_vals": sf.u_vals,
        "l_pos": sf.l_pos, "l_vals": sf.l_vals,
        "q": jnp.tile(jnp.asarray(q), 8),
        "a_cols": sharded.cols, "a_vals": sharded.vals,
    }
    apply_m = make_fsai_poly_sharded_apply(
        sf.halo, degree=1, a_halo=max(sharded.halo, 1),
        n_total=sharded.n_total,
    )
    dist = pcg_sharded(
        mesh, sharded, jnp.asarray(pad_vector(b, sharded.n_total)),
        m_data=m_data, apply_m=apply_m, mode="halo",
    )
    assert abs(int(dist.iterations) - int(single.iterations)) <= 2, (
        int(dist.iterations), int(single.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(dist.x)[:n], np.asarray(single.x)[:n],
        rtol=1e-5, atol=1e-8,
    )
