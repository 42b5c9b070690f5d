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
                    "learned"),
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
    # a real preconditioner must not be worse than vanilla (the learned
    # one is untrained here, so only IC is held to this)
    assert summary["incomplete_cholesky"]["iterations"] <= (
        summary["vanilla"]["iterations"]
    )
    assert (tmp_path / "table.csv").exists()
    assert (tmp_path / "totals.csv").exists()
    assert (tmp_path / "eigenvalues.csv").exists()
    # reference table schema (test.py:180-191)
    header = (tmp_path / "table.csv").read_text().splitlines()[0]
    assert header == ("technique,kappas,densities,iterations,setups,"
                      "durations,totals,successes")
