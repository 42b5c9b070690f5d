"""SpMV roofline sweep — BASELINE.md target: speed-of-light Gnnz/s per
chip on synthetic 3-D 7-point Poisson, 64^3 -> 256^3.

Reports the Pallas variable-coefficient DIA kernel and the matrix-free
constant-coefficient stencil, with achieved-vs-peak HBM bandwidth
fractions.  Writes assets/results/spmv_roofline.csv.

Usage: python scripts/spmv_roofline.py
"""

import csv
import sys
import time
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
    from deeppreconditioning_tpu.utils.profiling import time_kernel

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
        secs_dia = time_kernel(lambda v: dia_matvec_pallas(a, v), x)
        # ideal model: vals + x + y once = (n_diag + 2) words/row.
        # actual HBM traffic additionally re-reads x in the halo
        # overlap: the window per tile is tile + 2*halo_pad wide, so
        # x traffic is (1 + 2*halo/tile)x — count it honestly
        tile = dia_auto_tile(a.n_pad)
        halo_pad = ((a.halo + 127) // 128) * 128 if a.halo else 0
        x_factor = 1.0 + 2.0 * halo_pad / tile
        bytes_ideal = (a.vals.shape[0] + 2) * a.n_pad * 4
        bytes_actual = (
            (a.vals.shape[0] + 1 + x_factor) * a.n_pad * 4
        )
        # flat pad-based stencil: measures faster than the ghost-padded
        # layout on v5e ((n+2)-strided slabs are lane-hostile)
        xs = x[:n]
        secs_st = time_kernel(
            lambda v: poisson3d_stencil_matvec(v, shape), xs
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
        })
        print(rows_out[-1], flush=True)
        del a, x, xp

    out = Path("assets/results/spmv_roofline.csv")
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("w") as fio:
        writer = csv.DictWriter(fio, fieldnames=list(rows_out[0]))
        writer.writeheader()
        writer.writerows(rows_out)
    print(f"wrote {out}")

    # block-sparse engine (sparse/bsr.py + ops/pallas_bsr.py) on the
    # castellated 3-D family — the general-pattern operator path for
    # systems where voids break the pure-diagonal DIA layout; measured
    # as block-data streaming rate (the kernel is HBM-bound on blocks)
    from deeppreconditioning_tpu.data.fvm import generate_sludge_case_3d
    from deeppreconditioning_tpu.ops.pallas_bsr import bsr_matvec_pallas
    from deeppreconditioning_tpu.sparse.bsr import BSRMatrix

    bsr_rows = []
    for g in (32, 48, 64):
        case = generate_sludge_case_3d(
            np.random.default_rng(7), dims=(g, g, g),
            max_cells=g ** 3, solve=False,
        )
        a_sp = case.matrix.tocsr()
        n = a_sp.shape[0]
        a = BSRMatrix.from_scipy(a_sp, block_size=128)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(a.n_pad),
            jnp.float32,
        )
        secs = time_kernel(lambda v: bsr_matvec_pallas(a, v), x)
        block_bytes = int(np.prod(a.blocks.shape)) * 4
        bsr_rows.append({
            "grid": g,
            "n": n,
            "nnz": a_sp.nnz,
            "bsr_us": round(secs * 1e6, 1),
            "bsr_gnnz_s": round(a_sp.nnz / secs / 1e9, 2),
            "bsr_block_gb_s": round(block_bytes / secs / 1e9, 1),
        })
        print(bsr_rows[-1], flush=True)
        del a, x
    out2 = Path("assets/results/spmv_bsr.csv")
    with out2.open("w") as fio:
        writer = csv.DictWriter(fio, fieldnames=list(bsr_rows[0]))
        writer.writeheader()
        writer.writerows(bsr_rows)
    print(f"wrote {out2}")


if __name__ == "__main__":
    main()
