"""Distributed SpMV + PCG tests on an 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from deeppreconditioning_tpu.data.fvm import generate_sludge_case
from deeppreconditioning_tpu.parallel.partition import (
    pad_vector,
    shard_ell_rows,
)
from deeppreconditioning_tpu.parallel.pcg import (
    diag_local,
    make_mesh,
    pcg_sharded,
)
from deeppreconditioning_tpu.solvers.cg import (
    conjugate_gradient,
    ell_matvec,
    preconditioned_conjugate_gradient,
)
from deeppreconditioning_tpu.sparse import ELLMatrix

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _case():
    rng = np.random.default_rng(7)
    return generate_sludge_case(rng, mesh_cells=2)


def test_sharded_pcg_matches_single_device_allgather():
    case = _case()
    a = case.matrix.tocsr()
    n = a.shape[0]
    ell = ELLMatrix.from_scipy(a, dtype=jnp.float64)
    b = np.zeros(ell.n_pad)
    b[:n] = case.rhs

    single = conjugate_gradient(ell_matvec, ell, jnp.asarray(b))

    mesh = make_mesh(8)
    sharded = shard_ell_rows(ell, 8)
    b_pad = pad_vector(b, sharded.n_total)
    dist = pcg_sharded(mesh, sharded, jnp.asarray(b_pad))

    # same math modulo reduction order -> iteration counts within a few
    assert abs(int(dist.iterations) - int(single.iterations)) <= 3
    np.testing.assert_allclose(
        np.asarray(dist.x)[:n], np.asarray(single.x)[:n],
        rtol=1e-5, atol=1e-8,
    )
    assert float(dist.residual) < 1e-8


def test_sharded_pcg_halo_mode_banded():
    """Halo exchange is exact for banded matrices with bandwidth <=
    rows_per_shard (1-D Poisson: bandwidth 1)."""
    n = 512
    a = sp.diags(
        [-np.ones(n - 1), 2.1 * np.ones(n), -np.ones(n - 1)], [-1, 0, 1]
    ).tocsr()
    ell = ELLMatrix.from_scipy(a, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    b = np.zeros(ell.n_pad)
    b[:n] = rng.standard_normal(n)

    single = conjugate_gradient(ell_matvec, ell, jnp.asarray(b),
                                max_iter=2048)

    mesh = make_mesh(8)
    sharded = shard_ell_rows(ell, 8)
    assert sharded.halo == 1
    b_pad = pad_vector(b, sharded.n_total)
    dist = pcg_sharded(mesh, sharded, jnp.asarray(b_pad), mode="halo",
                       max_iter=2048)
    np.testing.assert_allclose(
        np.asarray(dist.x)[:n], np.asarray(single.x)[:n],
        rtol=1e-5, atol=1e-8,
    )


def test_sharded_jacobi_pcg():
    case = _case()
    a = case.matrix.tocsr()
    n = a.shape[0]
    ell = ELLMatrix.from_scipy(a, dtype=jnp.float64)
    b = np.zeros(ell.n_pad)
    b[:n] = case.rhs
    d = np.zeros(ell.n_pad)
    d[:n] = 1.0 / a.diagonal()

    single = preconditioned_conjugate_gradient(
        ell_matvec, ell, jnp.asarray(b),
        lambda m, r: m * r, jnp.asarray(d),
    )

    mesh = make_mesh(8)
    sharded = shard_ell_rows(ell, 8)
    b_pad = pad_vector(b, sharded.n_total)
    d_pad = pad_vector(d, sharded.n_total)
    dist = pcg_sharded(
        mesh, sharded, jnp.asarray(b_pad),
        m_data=jnp.asarray(d_pad), apply_m=diag_local,
    )
    assert abs(int(dist.iterations) - int(single.iterations)) <= 3
    assert float(dist.residual) < 1e-8


def test_shard_ell_roundtrip_matvec():
    """Sharded layout reproduces the plain matvec (no communication
    correctness issues in the data layout itself)."""
    case = _case()
    ell = ELLMatrix.from_scipy(case.matrix, dtype=jnp.float64)
    n = case.matrix.shape[0]
    sharded = shard_ell_rows(ell, 8)
    rng = np.random.default_rng(1)
    x = np.zeros(sharded.n_total)
    x[:n] = rng.standard_normal(n)

    # dense check of the flat sharded arrays
    cols = np.asarray(sharded.cols)
    vals = np.asarray(sharded.vals)
    x_ext = np.concatenate([x, [0.0]])
    y = (vals * x_ext[cols]).sum(1)
    np.testing.assert_allclose(y[:n], case.matrix @ x[:n], rtol=1e-10)
