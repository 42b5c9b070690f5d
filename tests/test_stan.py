"""StAn dataset loader test with synthetic frame-structure-style files.

The real Kaggle download (reference data_set.py:133-138) needs network
egress; the loader contract (npz keys: indices (2, nnz), values,
solution, rhs; hardcoded dof_max 5166, data_set.py:167) is exercised on
small synthetic SPD systems written in the same format.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from deeppreconditioning_tpu.data.datasets import StAnDataSet
from deeppreconditioning_tpu.models import precond_net_specs

SPECS = precond_net_specs((1, 8, 8, 8, 8, 8, 1))


@pytest.fixture(scope="module")
def stan_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("stan")
    rng = np.random.default_rng(0)
    for stage, count in (("train", 4), ("test", 2)):
        d = root / f"stand_small_{stage}"
        d.mkdir()
        for i in range(count):
            n = int(rng.integers(20, 40))
            b = sp.random(n, n, density=0.2, random_state=rng)
            a = (b @ b.T + 5 * sp.eye(n)).tocoo()
            x = rng.standard_normal(n)
            rhs = a @ x
            np.savez(
                d / f"{i:04d}.npz",
                indices=np.vstack([a.row, a.col]),
                values=a.data,
                solution=x,
                rhs=rhs,
            )
    return root


def test_stan_loader(stan_root, monkeypatch):
    monkeypatch.setattr(StAnDataSet, "DOF_MAX", 128)  # keep test small
    ds = StAnDataSet("train", batch_size=2, specs=SPECS, shuffle=False,
                     root=stan_root)
    assert len(ds) == 2
    batch = ds[0]
    assert batch.solutions.shape[0] == 2
    assert batch.solutions.shape[1] % 128 == 0
    # tril-only storage + unit diagonal after scaling
    dense = np.asarray(batch.systems.to_dense())[0]
    assert np.allclose(np.triu(dense, 1), 0)
    n0 = batch.original_sizes[0]
    np.testing.assert_allclose(np.diag(dense)[:n0], 1.0, rtol=1e-5)


def test_stan_missing_raises(tmp_path):
    with pytest.raises(AssertionError, match="no StAn files"):
        StAnDataSet("train", batch_size=1, specs=SPECS, root=tmp_path)
