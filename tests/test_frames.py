"""Frame-structure (StAn-like) family tests (data/frames.py)."""

import numpy as np
import pytest
import scipy.sparse as sp

from deeppreconditioning_tpu.data.frames import (
    beam_stiffness_local,
    generate_frame_case,
)
from deeppreconditioning_tpu.data.fvm import save_case


def test_beam_stiffness_is_symmetric_psd():
    k = beam_stiffness_local(1.3, 210.0, 80.0, 2.1, 2.1)
    np.testing.assert_allclose(k, k.T, atol=1e-12)
    w = np.linalg.eigvalsh(k)
    # 6 rigid-body modes (3 translations + 3 rotations), rest positive
    assert (w[:6] < 1e-8 * w[-1]).all()
    assert (w[6:] > 0).all()
    # rigid translation produces zero force
    for axis in range(3):
        u = np.zeros(12)
        u[axis] = u[6 + axis] = 1.0
        np.testing.assert_allclose(k @ u, 0.0, atol=1e-10)


def test_frame_case_spd_and_solution():
    rng = np.random.default_rng(7)
    case = generate_frame_case(rng)
    a = case.matrix.tocsr()
    n = a.shape[0]
    assert n % 6 == 0 and 300 <= n <= 2000
    assert abs(a - a.T).max() == 0.0
    lo = sp.linalg.eigsh(a, k=1, which="SA",
                         return_eigenvectors=False, maxiter=5000)
    assert lo[0] > 0, "stiffness matrix not SPD"
    resid = np.linalg.norm(a @ case.solution - case.rhs)
    assert resid < 1e-4 * np.linalg.norm(case.rhs) + 1e-5


def test_frame_case_roundtrip_through_dataset(tmp_path):
    """Saved frame cases load through the standard dataset/plan/bench
    machinery (reference on-disk layout)."""
    from deeppreconditioning_tpu.data.datasets import SludgePatternDataSet
    from deeppreconditioning_tpu.models import plan_builder_for

    rng = np.random.default_rng(3)
    for i in range(5):
        save_case(generate_frame_case(rng),
                  tmp_path / "frame_structures" / f"case_{i:04d}")
    specs = plan_builder_for("NeuralFSAI", None)
    ds = SludgePatternDataSet(
        stage="test", batch_size=1, specs=specs, shuffle=False,
        root=tmp_path, family="frame_structures",
    )
    assert len(ds) >= 1
    batch = ds[0]
    # scaled system has unit diagonal (dataset invariant)
    import jax.numpy as jnp

    tril = np.asarray(batch.systems.to_dense())[0]
    n0 = int(np.asarray(batch.scales[0] > 0).sum())
    np.testing.assert_allclose(np.diag(tril)[:n0], 1.0, atol=1e-6)


def test_frame_fsai_preconditioning_helps():
    """Classical FSAI on a frame case cuts PCG iterations vs Jacobi —
    the second family is a meaningful preconditioning target."""
    import jax.numpy as jnp

    from deeppreconditioning_tpu.ops.fsai import (
        fsai_factor_scipy,
        tril_power_pattern,
    )
    from deeppreconditioning_tpu.solvers.cg import (
        dense_matvec,
        preconditioned_conjugate_gradient,
    )

    rng = np.random.default_rng(11)
    case = generate_frame_case(rng)
    a = case.matrix.tocsr()
    n = a.shape[0]
    d = a.diagonal()
    dis = 1.0 / np.sqrt(d)
    at = sp.csr_matrix(a.multiply(np.outer(dis, dis)))
    coo = sp.tril(at).tocoo()
    pr, pc = tril_power_pattern(
        coo.row.astype(np.int32), coo.col.astype(np.int32), n, power=2
    )
    c_sp = fsai_factor_scipy(at, pr, pc)
    m = (c_sp @ c_sp.T).toarray()
    b = at @ np.ones(n)

    plain = preconditioned_conjugate_gradient(
        dense_matvec, jnp.asarray(at.toarray()), jnp.asarray(b),
    )
    fsai = preconditioned_conjugate_gradient(
        dense_matvec, jnp.asarray(at.toarray()), jnp.asarray(b),
        dense_matvec, jnp.asarray(m),
    )
    assert float(fsai.residual) < 1e-8
    assert int(fsai.iterations) < 0.6 * int(plain.iterations), (
        int(fsai.iterations), int(plain.iterations)
    )
