"""3-D castellated/permuted FVM family (data/fvm.py) + the non-banded
benchmark path (generic FSAI plans, capped learned width)."""

import numpy as np
import pytest
import scipy.sparse as sp

from deeppreconditioning_tpu.data.fvm import (
    generate_sludge_case_3d,
    save_case,
)


def _cases(n=4, seed=3):
    rng = np.random.default_rng(seed)
    return [
        generate_sludge_case_3d(rng, mesh_cells=2, permute=bool(i % 2))
        for i in range(n)
    ]


def test_3d_cases_are_spd_and_consistent():
    for case in _cases(4):
        a = case.matrix.tocsr()
        asym = abs(a - a.T)
        assert asym.nnz == 0 or asym.max() < 1e-12
        lam_min = sp.linalg.eigsh(
            a, k=1, which="SA", return_eigenvectors=False
        )[0]
        assert lam_min > 0
        # ground truth solves the system
        r = a @ case.solution - case.rhs
        assert np.linalg.norm(r) <= 2e-6 * max(
            np.linalg.norm(case.rhs), 1.0
        )


def test_permuted_case_defeats_range_plan():
    """The permuted half has no band structure: the range-blocked FSAI
    fast path must raise and the generic plan must still solve."""
    from deeppreconditioning_tpu.ops.fsai import (
        build_range_fsai_plan,
        tril_power_pattern,
    )

    case = _cases(2, seed=5)[1]  # the permuted one
    a = case.matrix.tocoo()
    keep = a.row >= a.col
    n = a.shape[0]
    n_pad = ((n + 7) // 8) * 8
    pad = np.arange(n, n_pad, dtype=np.int32)  # identity padding rows
    rows = np.concatenate([a.row[keep].astype(np.int32), pad])
    cols = np.concatenate([a.col[keep].astype(np.int32), pad])
    pr, pc = tril_power_pattern(rows, cols, n_pad, power=2)
    with pytest.raises(ValueError):
        build_range_fsai_plan(pr, pc, n_pad, range_h=max(n_pad // 4, 128))


def test_suite_runs_irregular_split(tmp_path):
    """End-to-end: mixed banded/permuted 3-D cases through the suite —
    fsai (generic path on the permuted half) must converge everywhere
    and out-iterate jacobi; an untrained NeuralFSAI at a capped width
    must also converge (capped pattern fallback)."""
    import jax
    from deeppreconditioning_tpu.bench.suite import BenchmarkSuite
    from deeppreconditioning_tpu.data.datasets import SludgePatternDataSet
    from deeppreconditioning_tpu.models import (
        FSAIPlanProvider,
        NeuralFSAI,
        plan_builder_for,
    )
    from deeppreconditioning_tpu.train.trainer import _fsai_operands

    root = tmp_path / "raw"
    for i, case in enumerate(_cases(5, seed=9)):
        save_case(case, root / "sludge_patterns_3d" / f"case_{i:04d}")

    specs = plan_builder_for("NeuralFSAI", None)
    ds = SludgePatternDataSet(
        stage="train", batch_size=1, specs=specs, shuffle=False,
        root=root, family="sludge_patterns_3d",
    )
    width = 12  # deliberately below the power-2 pattern width -> cap
    provider = FSAIPlanProvider(ds, power=2, width=64, kind="generic")
    model = NeuralFSAI(width=width, hidden=8)
    batch = ds[0]
    plans = provider(0, batch)
    # init params at the capped width via a tiny plan of matching width
    import jax.numpy as jnp
    from deeppreconditioning_tpu.ops.fsai import (
        build_fsai_plan,
        tril_power_pattern_capped,
    )

    p0 = batch.plans[0]
    rows = np.asarray(p0.rows[0])
    cols = np.asarray(p0.cols[0])
    valid = np.asarray(p0.valid[0])
    nnz = int(valid.sum())
    n_pad = batch.solutions.shape[1]
    mags = np.asarray(batch.features[0, :nnz, 0], np.float64)
    pr, pc = tril_power_pattern_capped(
        rows[:nnz].astype(np.int32), cols[:nnz].astype(np.int32),
        mags, n_pad, power=2, width=width,
    )
    plan_c = build_fsai_plan(
        rows[:nnz].astype(np.int32), cols[:nnz].astype(np.int32),
        pr, pc, n_pad, width=width, sentinel=batch.features.shape[1],
    )
    params = model.init(
        jax.random.PRNGKey(0), plan_c, batch.features[0, :, 0]
    )

    suite = BenchmarkSuite(
        ds, model, params,
        techniques=("vanilla", "jacobi", "fsai", "learned"),
        timing_reps=1, kappa_cases=0,
        fsai_power=2, learned_power=2,
        results_directory=tmp_path / "results",
    )
    suite.run()
    s = suite.summary()
    for name in suite.techniques:
        assert s[name]["success"] == 100.0, (name, s[name])
    assert s["fsai"]["iterations"] < s["jacobi"]["iterations"]
    assert s["learned"]["iterations"] < s["jacobi"]["iterations"]
