"""End-to-end BenchmarkSuite smoke test on CPU (RandomSPD, tiny)."""

import jax
import numpy as np

from deeppreconditioning_tpu.bench.suite import BenchmarkSuite
from deeppreconditioning_tpu.data.datasets import RandomSPDDataSet
from deeppreconditioning_tpu.models import (
    PreconditionerNet,
    precond_net_specs,
)


def test_suite_runs_all_techniques(tmp_path):
    channels = (1, 4, 8, 4, 1)
    specs = precond_net_specs(channels)
    ds = RandomSPDDataSet(
        "train", dof=32, batch_size=1, specs=specs, sparsity=0.8,
        length=3, seed=0, shuffle=False,
    )
    model = PreconditionerNet(channels=channels)
    batch = ds[0]
    sample_plans = [jax.tree.map(lambda x: x[0], p) for p in batch.plans]
    params = model.init(
        jax.random.PRNGKey(0), batch.features[0], sample_plans
    )
    suite = BenchmarkSuite(
        ds, model, params,
        techniques=("vanilla", "jacobi", "incomplete_cholesky",
                    "incomplete_cholesky_neumann", "fsai", "learned"),
        timing_reps=1, kappa_cases=1,
        results_directory=tmp_path,
    )
    suite.run()
    suite.dump_csv()
    summary = suite.summary()
    for name in suite.techniques:
        stats = summary[name]
        # every technique must converge on every case
        assert stats["success"] == 100.0, (name, stats)
        assert np.isfinite(stats["total"])
    # real preconditioners must not be worse than vanilla (the learned
    # one is untrained here, so only IC/FSAI are held to this)
    assert summary["incomplete_cholesky"]["iterations"] <= (
        summary["vanilla"]["iterations"]
    )
    assert summary["fsai"]["iterations"] <= (
        summary["vanilla"]["iterations"]
    )
    assert (tmp_path / "table.csv").exists()
    assert (tmp_path / "totals.csv").exists()
    assert (tmp_path / "eigenvalues.csv").exists()
    # reference table schema (test.py:180-191)
    header = (tmp_path / "table.csv").read_text().splitlines()[0]
    assert header == ("technique,kappas,densities,iterations,setups,"
                      "durations,totals,successes")


def test_suite_learned_neural_fsai_branch(tmp_path):
    """The learned technique with a NeuralFSAI model runs through the
    suite and, untrained (zero-init refinement), matches the classical
    fsai technique's iteration counts exactly."""
    import jax
    from deeppreconditioning_tpu.models import (
        FSAIPlanProvider,
        NeuralFSAI,
    )
    from deeppreconditioning_tpu.train.trainer import _fsai_operands

    specs = precond_net_specs((1, 1, 1))
    ds = RandomSPDDataSet(
        "train", dof=40, batch_size=1, specs=specs, sparsity=0.85,
        length=2, seed=1, shuffle=False,
    )
    width = 40
    provider = FSAIPlanProvider(ds, power=2, width=width)
    model = NeuralFSAI(width=width, hidden=8)
    batch = ds[0]
    plans = provider(0, batch)
    operands = _fsai_operands(
        plans, batch.features[:, :, 0], batch.systems.to_dense()
    )
    params = model.init(
        jax.random.PRNGKey(0),
        jax.tree.map(lambda x: x[0], plans), operands[0],
    )
    suite = BenchmarkSuite(
        ds, model, params,
        techniques=("vanilla", "fsai", "learned"),
        timing_reps=1, kappa_cases=0, fsai_power=2,
        results_directory=tmp_path,
    )
    suite.run()
    s = suite.summary()
    assert s["learned"]["success"] == 100.0
    assert s["learned"]["iterations"] == s["fsai"]["iterations"]


def test_batched_protocol_iteration_parity(tmp_path):
    """run_batched (one compiled solve for the whole split, sparsified
    applies) reproduces the per-case protocol's iteration counts and
    converges on every case for every technique it supports."""
    import jax
    from deeppreconditioning_tpu.models import (
        FSAIPlanProvider,
        NeuralFSAI,
    )
    from deeppreconditioning_tpu.train.trainer import _fsai_operands

    specs = precond_net_specs((1, 1, 1))
    ds = RandomSPDDataSet(
        "train", dof=40, batch_size=1, specs=specs, sparsity=0.85,
        length=3, seed=2, shuffle=False,
    )
    width = 40
    provider = FSAIPlanProvider(ds, power=2, width=width, kind="generic")
    model = NeuralFSAI(width=width, hidden=8)
    batch = ds[0]
    plans = provider(0, batch)
    operands = _fsai_operands(
        plans, batch.features[:, :, 0], batch.systems.to_dense()
    )
    params = model.init(
        jax.random.PRNGKey(0),
        jax.tree.map(lambda x: x[0], plans), operands[0],
    )
    techniques = ("vanilla", "jacobi", "incomplete_cholesky_neumann",
                  "fsai", "learned")
    suite = BenchmarkSuite(
        ds, model, params,
        techniques=techniques,
        timing_reps=1, kappa_cases=0, fsai_power=2, learned_power=2,
        results_directory=tmp_path,
    )
    suite.run()
    batched = suite.run_batched(reps=1, setup_reps=1, chunk=2)
    suite.dump_csv_batched()
    assert (tmp_path / "batched.csv").exists()
    for name in techniques:
        stats = batched[name]
        assert stats["success"] == 100.0, (name, stats)
        per_case = np.asarray(suite.iterations[name])
        bat = np.asarray(stats["iterations_per_case"])
        # identical masked-convergence semantics; the batched matvec is
        # the scaled-dense form (f32 rounding differs from the raw ELL
        # form), which can move a count near the tolerance by a couple
        assert np.abs(per_case - bat).max() <= 2, (name, per_case, bat)


def test_batched_learned_banded_matches_dense(tmp_path):
    """The banded factor-form batched learned apply (setup = model
    forward + band extraction) reproduces the dense-materialized path's
    per-case iteration counts (exact-arithmetic equal operators)."""
    import jax
    from deeppreconditioning_tpu.models import (
        FSAIPlanProvider,
        NeuralFSAI,
    )
    from deeppreconditioning_tpu.train.trainer import _fsai_operands

    specs = precond_net_specs((1, 1, 1))
    ds = RandomSPDDataSet(
        "train", dof=40, batch_size=1, specs=specs, sparsity=0.85,
        length=3, seed=4, shuffle=False,
    )
    width = 40
    provider = FSAIPlanProvider(ds, power=2, width=width, kind="generic")
    model = NeuralFSAI(width=width, hidden=8)
    batch = ds[0]
    plans = provider(0, batch)
    operands = _fsai_operands(
        plans, batch.features[:, :, 0], batch.systems.to_dense()
    )
    params = model.init(
        jax.random.PRNGKey(0),
        jax.tree.map(lambda x: x[0], plans), operands[0],
    )
    results = {}
    for mode in ("banded", "dense"):
        suite = BenchmarkSuite(
            ds, model, params,
            techniques=("learned",),
            timing_reps=1, kappa_cases=0, fsai_power=2, learned_power=2,
            batched_learned_apply=mode,
            results_directory=tmp_path,
        )
        batched = suite.run_batched(
            techniques=("learned",), reps=1, setup_reps=1, chunk=2,
            m_dtype=None,
        )
        assert batched["learned"]["success"] == 100.0, mode
        results[mode] = np.asarray(
            batched["learned"]["iterations_per_case"]
        )
    np.testing.assert_array_equal(results["banded"], results["dense"])


def test_suite_fsai_matches_scipy_reference(tmp_path):
    """The suite's scaled-then-folded FSAI equals FSAI computed directly
    on the raw system (scaling covariance)."""
    import jax.numpy as jnp
    import scipy.sparse as sp
    from deeppreconditioning_tpu.bench.suite import (
        BenchmarkSuite, _fsai_setup_device,
    )
    from deeppreconditioning_tpu.ops.fsai import (
        fsai_factor_scipy, tril_power_pattern,
    )

    channels = (1, 4, 8, 4, 1)
    specs = precond_net_specs(channels)
    ds = RandomSPDDataSet(
        "train", dof=48, batch_size=1, specs=specs, sparsity=0.85,
        length=2, seed=3, shuffle=False,
    )
    suite = BenchmarkSuite(
        ds, None, None, techniques=("vanilla", "fsai"),
        timing_reps=1, kappa_cases=0,
        results_directory=tmp_path,
    )
    batch = ds[0]
    a_sp, _, n0 = suite._reconstruct(0)
    from deeppreconditioning_tpu.sparse import ELLMatrix
    ell = ELLMatrix.from_scipy(a_sp, n_pad=ds.dof_pad)
    from deeppreconditioning_tpu.bench.suite import (
        _fsai_range_setup_device,
    )
    kind, plan, operand, scales0 = suite._fsai_plan(0, batch, ell)
    setup_fn = (_fsai_range_setup_device if kind == "range"
                else _fsai_setup_device)
    m = np.asarray(setup_fn(
        plan, operand.astype(jnp.float64),
        scales0, jnp.int32(n0), dtype=jnp.float64,
    ))[:n0, :n0]

    r0, c0, _ = suite._l0_sites(0)
    keep = (r0 < n0) & (c0 < n0)
    pr, pc = tril_power_pattern(
        r0[keep], c0[keep], n0, power=suite.fsai_power
    )
    c_ref = fsai_factor_scipy(a_sp, pr, pc)
    m_ref = (c_ref @ c_ref.T).toarray()
    np.testing.assert_allclose(m, m_ref, rtol=1e-4, atol=1e-6)


def test_batched_amg_compose_matches_amg_apply(tmp_path):
    """_amg_dense_compose's dense M reproduces ops/amg.amg_apply's
    V(1,1)-cycle exactly (same one-level hierarchy, no coarse filter)."""
    import jax
    import jax.numpy as jnp
    from deeppreconditioning_tpu.bench.suite import _amg_dense_compose
    from deeppreconditioning_tpu.ops.amg import amg_apply, build_amg

    specs = precond_net_specs((1, 1, 1))
    ds = RandomSPDDataSet(
        "train", dof=40, batch_size=1, specs=specs, sparsity=0.85,
        length=3, seed=2, shuffle=False,
    )
    suite = BenchmarkSuite(
        ds, None, None, techniques=("algebraic_multigrid",),
        timing_reps=1, kappa_cases=0, results_directory=tmp_path,
    )
    common = suite._batched_common()
    apply_fn, m, _ = suite._batched_setup(
        "algebraic_multigrid", 1, 2, m_dtype=None
    )
    rng = np.random.default_rng(0)
    for index in range(len(ds)):
        a_sp = common["a_sps"][index]
        n_pad = common["n_pad"]
        pre = build_amg(a_sp, n_pad=n_pad, dtype=jnp.float64,
                        filter_eps=0.0)
        r = np.zeros(n_pad)
        r[: a_sp.shape[0]] = rng.standard_normal(a_sp.shape[0])
        z_ref = np.asarray(amg_apply(pre, jnp.asarray(r)))
        z_got = np.asarray(m[index], np.float64) @ r
        np.testing.assert_allclose(
            z_got[: a_sp.shape[0]], z_ref[: a_sp.shape[0]],
            rtol=2e-4, atol=1e-8,
        )


def test_batched_amg_converges(tmp_path):
    specs = precond_net_specs((1, 1, 1))
    ds = RandomSPDDataSet(
        "train", dof=40, batch_size=1, specs=specs, sparsity=0.85,
        length=3, seed=2, shuffle=False,
    )
    suite = BenchmarkSuite(
        ds, None, None,
        techniques=("jacobi", "algebraic_multigrid"),
        timing_reps=1, kappa_cases=0, results_directory=tmp_path,
    )
    batched = suite.run_batched(reps=1, setup_reps=1, chunk=2,
                                m_dtype=None)
    st = batched["algebraic_multigrid"]
    assert st["success"] == 100.0
    assert st["iterations"] < batched["jacobi"]["iterations"]
