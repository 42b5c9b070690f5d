"""SpMV roofline sweep — BASELINE.md target: speed-of-light Gnnz/s per
chip on synthetic 3-D 7-point Poisson, 64^3 -> 256^3.

Reports the Pallas variable-coefficient DIA kernel and the matrix-free
constant-coefficient stencil, with achieved-vs-peak HBM bandwidth
fractions.  Writes assets/results/spmv_roofline.csv.

Usage: python scripts/spmv_roofline.py
"""

import csv

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deeppreconditioning_tpu.ops.pallas_spmv import (
        dia_auto_tile,
        dia_matvec_pallas,
    )
    from deeppreconditioning_tpu.ops.pallas_stencil import (
        poisson3d_stencil_matvec,
    )
    from deeppreconditioning_tpu.sparse.dia import poisson_dia
    from deeppreconditioning_tpu.utils.profiling import (
        next_unique,
        time_chain,
        time_cold_stream,
    )

    hbm_gb_s = 820.0  # v5e
    rows_out = []
    for g in (64, 96, 128, 192, 256):
        shape = (g, g, g)
        n = g ** 3
        a = poisson_dia(shape, dtype=jnp.float32)
        nnz = int(np.count_nonzero(np.asarray(a.vals)))
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(a.n_pad),
            jnp.float32,
        )
        # K calls dependency-chained INSIDE one jit: per-dispatch tunnel
        # overhead (~0.5-1.3 ms) otherwise swamps sub-ms kernels.  The
        # operator rides as an ARGUMENT — a closure constant gets baked
        # into the compile request (468 MB of vals at 256^3 -> HTTP 413
        # from the remote compile helper)
        k_inner = 10

        def chain_dia(a_arg, v):
            for _ in range(k_inner):
                v = dia_matvec_pallas(a_arg, v)
            return v

        # TWO protocols (two-point time_chain metrology for both; the
        # r4 time_kernel form folded the ~24 ms fetch RTT into 100
        # matvecs and read 64^3-128^3 as tunnel overhead):
        #   cold — every rep's operator streams from HBM (operator
        #     pool > VMEM, utils/profiling.time_cold_stream); this is
        #     the streaming roofline the bw_frac columns score.
        #   resident — one operator chained k_inner deep; at <= 128^3
        #     XLA keeps it in on-chip memory and the rate rises past
        #     "HBM bandwidth" (45.6 us for a 75 MB sweep at 128^3).
        #     Real reuse performance — it is what a PCG iteration
        #     enjoys — but not streaming throughput.
        secs_res = time_chain(
            chain_dia, a,
            lambda i: x * (1.0 + next_unique() * jnp.float32(1.2e-7)),
            reps=(4, 16),
        ) / k_inner
        offs, n_ = a.offsets, a.n
        secs_dia = time_cold_stream(
            lambda vals, v: dia_matvec_pallas(
                type(a)(vals=vals, offsets=offs, n=n_), v),
            a.vals, x,
        )
        # ideal model: vals + x + y once = (n_diag + 2) words/row.
        # actual HBM traffic additionally re-reads x in the halo
        # overlap: the window per tile is tile + 2*halo_pad wide, so
        # x traffic is (1 + 2*halo/tile)x — count it honestly
        halo_pad = ((a.halo + 511) // 512) * 512 if a.halo else 0
        tile = dia_auto_tile(a.n_pad, halo_pad)
        x_factor = 1.0 + 2.0 * halo_pad / tile
        bytes_ideal = (a.vals.shape[0] + 2) * a.n_pad * 4
        bytes_actual = (
            (a.vals.shape[0] + 1 + x_factor) * a.n_pad * 4
        )
        # flat pad-based stencil: measures faster than the ghost-padded
        # layout on v5e ((n+2)-strided slabs are lane-hostile)
        xs = x[:n]

        def chain_st(_op, v, shp=shape):
            for _ in range(k_inner):
                v = poisson3d_stencil_matvec(v, shp)
            return v

        secs_st_res = time_chain(
            chain_st, jnp.zeros(()),
            lambda i: xs * (1.0 + next_unique() * jnp.float32(1.2e-7)),
            reps=(4, 16),
        ) / k_inner
        # matrix-free: the only big array is x itself — cold-stream it
        secs_st = time_cold_stream(
            lambda xe, s: poisson3d_stencil_matvec(xe * s, shape),
            xs, jnp.float32(1.0),
        )
        bytes_st = 2 * n * 4
        rows_out.append({
            "grid": g,
            "n": n,
            "nnz": nnz,
            "dia_us": round(secs_dia * 1e6, 1),
            "dia_gnnz_s": round(nnz / secs_dia / 1e9, 2),
            "dia_gb_s": round(bytes_ideal / secs_dia / 1e9, 1),
            "dia_bw_frac": round(
                bytes_ideal / secs_dia / 1e9 / hbm_gb_s, 3
            ),
            "dia_gb_s_actual": round(
                bytes_actual / secs_dia / 1e9, 1
            ),
            "dia_bw_frac_actual": round(
                bytes_actual / secs_dia / 1e9 / hbm_gb_s, 3
            ),
            "stencil_us": round(secs_st * 1e6, 1),
            "stencil_gnnz_s": round(nnz / secs_st / 1e9, 2),
            "stencil_gb_s": round(bytes_st / secs_st / 1e9, 1),
            "stencil_bw_frac": round(
                bytes_st / secs_st / 1e9 / hbm_gb_s, 3
            ),
            # resident chains at small grids can come back sub-noise
            # (negative two-point slope) — clamp to 0 = "below the
            # measurement floor" (MEASUREMENT.md §6)
            "dia_resident_us": round(max(secs_res, 0.0) * 1e6, 1),
            "dia_resident_gnnz_s": round(
                nnz / secs_res / 1e9, 2) if secs_res > 0 else 0.0,
            "stencil_resident_us": round(
                max(secs_st_res, 0.0) * 1e6, 1),
            "stencil_resident_gnnz_s": round(
                nnz / secs_st_res / 1e9, 2) if secs_st_res > 0
            else 0.0,
        })
        print(rows_out[-1], flush=True)
        del a, x, xs

    out = Path("assets/results/spmv_roofline.csv")
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("w") as fio:
        writer = csv.DictWriter(fio, fieldnames=list(rows_out[0]))
        writer.writeheader()
        writer.writerows(rows_out)
    print(f"wrote {out}")

    if "--dia-only" in sys.argv:
        return  # committed spmv_bsr.csv stands; the frame-structure
        # operator's host-side scipy build alone runs ~10+ min

    # block-sparse engine (sparse/bsr.py + ops/pallas_bsr.py).  BSR is
    # the operator format for matrices with dense BLOCK substructure —
    # multi-dof-per-node discretizations like the frame-structure family
    # (data/frames.py, 6 dof/node).  Point stencils stored as BSR are a
    # deliberate format-mismatch demonstration: a 7-point row fills <6%
    # of a 128-block, so nnz-rate collapses while block streaming stays
    # at the kernel's rate — both columns are reported so the mismatch
    # is visible, plus a block-dense design-point row (the honest kernel
    # roofline) and a large frame operator (the real consumer).
    import scipy.sparse as sp

    from deeppreconditioning_tpu.data.frames import generate_frame_case
    from deeppreconditioning_tpu.data.fvm import generate_sludge_case_3d
    from deeppreconditioning_tpu.ops.pallas_bsr import bsr_matvec_pallas
    from deeppreconditioning_tpu.sparse.bsr import BSRMatrix

    def time_bsr(a, x, k=10):
        """K kernel calls dependency-chained inside one jit, reps
        scan-chained with bitwise-distinct inputs, two-point slope
        (time_chain) — same RTT-removal rationale as the DIA sweep
        above; operator rides as an argument (closure constants bloat
        the remote-compile request past its body limit)."""

        def chain_a(a_arg, xv):
            for _ in range(k):
                xv = bsr_matvec_pallas(a_arg, xv)[: x.shape[0]]
            return xv

        return time_chain(
            chain_a, a,
            lambda i: x * (1.0 + next_unique() * jnp.float32(1.2e-7)),
            reps=(3, 9),
        ) / k

    def bsr_row(label, a_sp):
        a = BSRMatrix.from_scipy(a_sp, block_size=128)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(a.n_pad),
            jnp.float32,
        )
        secs = time_bsr(a, x)
        block_bytes = int(np.prod(a.blocks.shape)) * 4
        fill = a_sp.nnz / max(int(np.prod(a.blocks.shape)), 1)
        row = {
            "operator": label,
            "n": a_sp.shape[0],
            "nnz": a_sp.nnz,
            "block_fill": round(fill, 4),
            "bsr_us": round(secs * 1e6, 1),
            "bsr_gnnz_s": round(a_sp.nnz / secs / 1e9, 2),
            "bsr_block_gb_s": round(block_bytes / secs / 1e9, 1),
        }
        print(row, flush=True)
        del a, x
        return row

    bsr_rows = []
    # design point: random block-dense operator (every stored 128-block
    # full) — the kernel's honest streaming roofline
    rng = np.random.default_rng(5)
    nb, per_row = 512, 8  # 65k rows, 8 dense blocks each = 268M nnz/8
    rows_idx = np.repeat(np.arange(nb), per_row)
    cols_idx = rng.integers(0, nb, size=nb * per_row)
    dense_blocks = rng.standard_normal(
        (nb * per_row, 128, 128)
    ).astype(np.float32)
    a_dense_blocks = sp.bsr_matrix(
        (dense_blocks, cols_idx, np.arange(0, nb * per_row + 1,
                                           per_row)),
        shape=(nb * 128, nb * 128),
    ).tocsr()
    bsr_rows.append(bsr_row("block_dense_512x8", a_dense_blocks))
    del a_dense_blocks, dense_blocks

    # real consumer: large frame-structure stiffness operator
    # (30x30x20 nodes -> ~104k free dof, 6-dof blocks)
    frame = generate_frame_case(
        np.random.default_rng(9), dims=(30, 30, 20), solve=False
    )
    big = frame.matrix.tocsr()
    bsr_rows.append(bsr_row("frame_structure", big))

    # format-mismatch demonstration: point stencil in BSR
    for g in (48, 64):
        case = generate_sludge_case_3d(
            np.random.default_rng(7), dims=(g, g, g),
            max_cells=g ** 3, solve=False,
        )
        bsr_rows.append(bsr_row(f"stencil_{g}cubed",
                                case.matrix.tocsr()))
    out2 = Path("assets/results/spmv_bsr.csv")
    with out2.open("w") as fio:
        writer = csv.DictWriter(fio, fieldnames=list(bsr_rows[0]))
        writer.writeheader()
        writer.writerows(bsr_rows)
    print(f"wrote {out2}")


if __name__ == "__main__":
    main()
