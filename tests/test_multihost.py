"""Multi-process communication backend (parallel/multihost.py): a real
2-process CPU run over Gloo collectives — the bootstrap, mesh build,
and distributed PCG must work across process boundaries, not just on a
single-process virtual mesh (SURVEY §2.4 item 5)."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import scipy.sparse as sp

WORKER = Path(__file__).parent / "_mp_pcg_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_pcg_matches_single_device():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        # workers manage their own platform/devices
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]
    line = [ln for ln in outs[0][0].splitlines() if ln.startswith("{")][-1]
    result = json.loads(line)
    assert result["processes"] == 2

    # single-device reference (this process, CPU)
    import jax

    from deeppreconditioning_tpu.solvers.cg import (
        ell_matvec,
        preconditioned_conjugate_gradient,
    )
    from deeppreconditioning_tpu.sparse import ELLMatrix
    import jax.numpy as jnp

    n = 512
    a = sp.diags(
        [-np.ones(n - 1), 2.1 * np.ones(n), -np.ones(n - 1)], [-1, 0, 1]
    ).tocsr()
    ell = ELLMatrix.from_scipy(a, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    b = np.zeros(ell.n_pad)
    b[:n] = rng.standard_normal(n)
    d = np.zeros(ell.n_pad)
    d[:n] = 1.0 / a.diagonal()
    single = preconditioned_conjugate_gradient(
        ell_matvec, ell, jnp.asarray(b), lambda m, r: m * r,
        jnp.asarray(d), max_iter=2048,
    )
    assert abs(result["iterations"] - int(single.iterations)) <= 3, (
        result, int(single.iterations)
    )
    assert result["residual"] < 1e-8
