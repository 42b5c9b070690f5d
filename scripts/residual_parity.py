"""Residual-curve parity report (BASELINE.md target: iteration counts and
residual curves must match the reference protocol within tolerance).

For each of the first N test cases, runs PCG in float64 (the reference's
arithmetic, cg.py:58) and float32 (the TPU performance dtype) for the
vanilla and Jacobi techniques, dumps both residual curves, and reports
the iteration-count deltas.  The f64 run *is* the reference algorithm —
same update order, same squared-relative-residual stopping rule — so
curve agreement is the parity certificate.

Usage: python scripts/residual_parity.py [--cases N] [--platform cpu]
"""

import argparse
import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cases", type=int, default=5)
    parser.add_argument("--platform", default=None,
                        help="force jax platform (e.g. cpu)")
    parser.add_argument("--out", type=Path,
                        default=Path("assets/results/residual_parity.csv"))
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from deeppreconditioning_tpu.data.fvm import generate_sludge_case
    from deeppreconditioning_tpu.ops.ic0 import jacobi_preconditioner
    from deeppreconditioning_tpu.solvers.cg import (
        ell_matvec,
        pcg_with_history,
    )
    from deeppreconditioning_tpu.sparse import ELLMatrix

    rng = np.random.default_rng(69420)
    rows_out = []
    for case_idx in range(args.cases):
        case = generate_sludge_case(rng, mesh_cells=2)
        a = case.matrix.tocsr()
        n = a.shape[0]
        for dtype, label in ((jnp.float64, "f64"), (jnp.float32, "f32")):
            ell = ELLMatrix.from_scipy(a, dtype=dtype)
            b = np.zeros(ell.n_pad)
            b[:n] = case.rhs
            b_dev = jnp.asarray(b, dtype)

            for tech in ("vanilla", "jacobi"):
                if tech == "jacobi":
                    d = np.zeros(ell.n_pad)
                    d[:n] = jacobi_preconditioner(a)
                    res, hist = pcg_with_history(
                        ell_matvec, ell, b_dev,
                        lambda m, r: m * r, jnp.asarray(d, dtype),
                    )
                else:
                    res, hist = pcg_with_history(ell_matvec, ell, b_dev)
                hist = np.asarray(hist)
                iters = int(res.iterations)
                rows_out.append({
                    "case": case_idx,
                    "technique": tech,
                    "dtype": label,
                    "iterations": iters,
                    "final_sq_rel_residual": float(res.residual),
                    "curve": ";".join(
                        f"{v:.6e}" for v in hist[:iters]
                    ),
                })
                print(f"case {case_idx} {tech} {label}: "
                      f"{iters} iters, final {float(res.residual):.2e}")

    # parity summary: f32 vs f64 iteration deltas
    by_key = {}
    for r in rows_out:
        by_key.setdefault((r["case"], r["technique"]), {})[r["dtype"]] = r
    max_delta = 0
    for (c, t), d in by_key.items():
        delta = abs(d["f32"]["iterations"] - d["f64"]["iterations"])
        max_delta = max(max_delta, delta)
        rel = delta / max(d["f64"]["iterations"], 1)
        print(f"case {c} {t}: f64={d['f64']['iterations']} "
              f"f32={d['f32']['iterations']} (delta {delta}, {rel:.1%})")
    print(f"max iteration delta f32 vs f64: {max_delta}")

    args.out.parent.mkdir(parents=True, exist_ok=True)
    with args.out.open("w") as fio:
        writer = csv.DictWriter(fio, fieldnames=list(rows_out[0]))
        writer.writeheader()
        writer.writerows(rows_out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
