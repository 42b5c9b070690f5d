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

    from deeppreconditioning_tpu.ops.pallas_spmv import dia_matvec_pallas
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
        bytes_dia = (a.vals.shape[0] + 2) * a.n_pad * 4
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
            "dia_gb_s": round(bytes_dia / secs_dia / 1e9, 1),
            "dia_bw_frac": round(bytes_dia / secs_dia / 1e9 / hbm_gb_s,
                                 3),
            "stencil_us": round(secs_st * 1e6, 1),
            "stencil_gnnz_s": round(nnz / secs_st / 1e9, 2),
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


if __name__ == "__main__":
    main()
