"""Worker for the 2-process distributed-PCG test (test_multihost.py).

Launched once per process with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set; joins the mesh through
parallel.multihost.initialize_if_needed (the production bootstrap),
solves a banded Poisson system with halo-mode distributed PCG, and
prints one JSON result line from process 0.
"""

import json
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deeppreconditioning_tpu.parallel.multihost import (  # noqa: E402
    initialize_if_needed,
    solver_mesh,
)

assert initialize_if_needed(), "multi-process env not detected"

import numpy as np  # noqa: E402
import scipy.sparse as sp  # noqa: E402

from deeppreconditioning_tpu.parallel.partition import (  # noqa: E402
    pad_vector,
    shard_ell_rows,
)
from deeppreconditioning_tpu.parallel.pcg import (  # noqa: E402
    diag_local,
    pcg_sharded,
)
from deeppreconditioning_tpu.sparse import ELLMatrix  # noqa: E402


def main() -> None:
    n = 512
    a = sp.diags(
        [-np.ones(n - 1), 2.1 * np.ones(n), -np.ones(n - 1)], [-1, 0, 1]
    ).tocsr()
    import jax.numpy as jnp

    ell = ELLMatrix.from_scipy(a, dtype=jnp.float64)
    n_dev = len(jax.devices())
    sharded = shard_ell_rows(ell, n_dev)
    # feed host copies: every process holds the full operand, jit
    # shards them over the global mesh
    sharded = jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, sharded
    )
    rng = np.random.default_rng(0)
    b = np.zeros(ell.n_pad)
    b[:n] = rng.standard_normal(n)
    b_pad = pad_vector(b, sharded.n_total)
    d = np.zeros(sharded.n_total)
    d[:n] = 1.0 / a.diagonal()

    mesh = solver_mesh()
    res = pcg_sharded(
        mesh, sharded, b_pad, m_data=d, apply_m=diag_local,
        mode="halo", max_iter=2048,
    )
    if jax.process_index() == 0:
        print(json.dumps({
            "processes": jax.process_count(),
            "devices": n_dev,
            "iterations": int(res.iterations),
            "residual": float(res.residual),
        }), flush=True)


if __name__ == "__main__":
    main()
