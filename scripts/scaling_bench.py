"""Distributed-PCG scaling benchmark (BASELINE.md scaling-efficiency
target).

Measures distributed PCG wall time on a 3-D Poisson system across shard
counts on whatever mesh is available: a real multi-chip slice when
present, otherwise the 8-device virtual CPU mesh (functional scaling —
communication-pattern correctness and collective counts, not silicon
bandwidth).  Writes scaling.csv.

Usage:
  python scripts/scaling_bench.py                  # real devices
  python scripts/scaling_bench.py --virtual 8      # virtual CPU mesh
"""

import argparse
import csv
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--virtual", type=int, default=0,
                        help="force a virtual CPU mesh of this size")
    parser.add_argument("--grid", type=int, default=64,
                        help="Poisson grid edge (n = grid^3)")
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--out", type=Path,
                        default=Path("assets/results/scaling.csv"))
    args = parser.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    import numpy as np

    from deeppreconditioning_tpu.parallel.multihost import (
        initialize_if_needed,
    )
    from deeppreconditioning_tpu.parallel.partition import (
        pad_vector,
        shard_ell_rows,
    )
    from deeppreconditioning_tpu.parallel.pcg import make_mesh, pcg_sharded
    from deeppreconditioning_tpu.sparse.dia import poisson_dia
    from deeppreconditioning_tpu.sparse.ell import ELLMatrix

    initialize_if_needed()
    n_devices = len(jax.devices())
    g = args.grid
    shape = (g, g, g)

    # build the system once as ELL (row-partitionable layout)
    import scipy.sparse as sp

    dia = poisson_dia(shape, dtype=jnp.float32)
    dense_n = dia.n
    a_scipy = sp.csr_matrix(
        sp.diags(
            [np.asarray(dia.vals[d, :dense_n]) for d in
             range(len(dia.offsets))],
            dia.offsets, shape=(dense_n, dense_n),
        )
    )
    rng = np.random.default_rng(0)
    b_host = rng.standard_normal(dense_n).astype(np.float32)

    rows_out = []
    shard_counts = [s for s in (1, 2, 4, 8, 16, 32)
                    if s <= n_devices]
    for s in shard_counts:
        ell = ELLMatrix.from_scipy(a_scipy, dtype=jnp.float32)
        sharded = shard_ell_rows(ell, s)
        mesh = make_mesh(s)
        b = jnp.asarray(pad_vector(b_host, sharded.n_total))
        mode = ("halo" if sharded.halo <= sharded.rows_per_shard
                else "allgather")
        res = pcg_sharded(mesh, sharded, b, mode=mode, max_iter=256)
        jax.block_until_ready(res)
        start = time.perf_counter()
        for _ in range(args.reps):
            res = pcg_sharded(mesh, sharded, b, mode=mode, max_iter=256)
        jax.block_until_ready(res)
        dt = (time.perf_counter() - start) / args.reps
        rows_out.append({
            "shards": s,
            "mode": mode,
            "n": dense_n,
            "iterations": int(res.iterations),
            "seconds": dt,
            "speedup_vs_1": (rows_out[0]["seconds"] / dt
                             if rows_out else 1.0),
            "efficiency": ((rows_out[0]["seconds"] / dt) / s
                           if rows_out else 1.0),
        })
        print(f"shards={s} mode={mode}: {dt*1e3:.1f}ms "
              f"iters={int(res.iterations)} "
              f"eff={rows_out[-1]['efficiency']:.2f}")

    args.out.parent.mkdir(parents=True, exist_ok=True)
    with args.out.open("w") as fio:
        writer = csv.DictWriter(fio, fieldnames=list(rows_out[0]))
        writer.writeheader()
        writer.writerows(rows_out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
