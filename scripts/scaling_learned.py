"""Learned preconditioner at scale: 64^3 / 128^3 Poisson on the chip.

The BASELINE.md scaling target (VERDICT r3 next #3): show the learned
technique's iteration crown converting to wall clock where iterations
dominate — single large systems, DIA operator, factor-form structured
apply (ops/structured_fsai.py), the trained width-local head from
scripts/train_structured.py deployed at grids it never saw.

Per technique (vanilla / jacobi / fsai / learned): setup seconds
(chained reps, one sync — CLAUDE.md timing discipline), solve seconds
(chained full PCG solves), iterations, and the total; written to
assets/results/scaling_learned.csv and printed as JSON for bench.py's
scaling section.

Usage: python scripts/scaling_learned.py [--shapes 64,128]
    [--ckpt assets/checkpoints_structured/best.msgpack] [--reps 4]
    [--sigma 0] [--out CSV]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent


def run_scaling(shapes, ckpt, sigma=1.0, reps=4, rtol=1e-8,
                out=None):
    """Run the scaling comparison; returns (rows, details).

    Importable by bench.py for the driver's scaling section — it must
    run IN-PROCESS (a subprocess would block forever on the
    single-client TPU grant the caller already holds).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from deeppreconditioning_tpu.data.poisson import poisson_coeff_dia
    from deeppreconditioning_tpu.ops.structured_fsai import (
        build_structured_plan,
        dia_sorted_by_offset,
        make_structured_poly_apply,
        structured_setup,
    )
    from deeppreconditioning_tpu.solvers.cg import (
        pcg_fixed_trips,
        preconditioned_conjugate_gradient,
    )
    from deeppreconditioning_tpu.sparse.dia import poisson_dia

    ckpt_path = Path(ckpt)
    payload = serialization.msgpack_restore(ckpt_path.read_bytes())
    power = int(payload["power"])
    degree = int(payload["poly_degree"])
    params = payload["params"]
    print(f"checkpoint: width={payload['width']} degree={degree} "
          f"power={power} trained@{payload.get('train_shape')}",
          flush=True)

    def matvec(a_data, x):
        return a_data.matvec(x)

    rows = []
    details = {}
    for side in shapes:
        shape = (side, side, side)
        if sigma > 0:
            a = poisson_coeff_dia(
                shape, rng=np.random.default_rng(1), sigma=sigma,
                dtype=jnp.float32,
            )
        else:
            a = poisson_dia(shape, dtype=jnp.float32)
        a = dia_sorted_by_offset(a)
        n = a.n
        rng = np.random.default_rng(2)
        x_star = np.zeros(a.n_pad, np.float32)
        x_star[:n] = rng.standard_normal(n)
        b = jnp.asarray(np.asarray(a.matvec(jnp.asarray(x_star))))
        plan = build_structured_plan(shape, power=power)
        diag_idx = a.offsets.index(0)
        inv_diag = jnp.where(
            a.vals[diag_idx] == 0, 0.0, 1.0 /
            jnp.where(a.vals[diag_idx] == 0, 1.0, a.vals[diag_idx])
        )

        def time_setup(fn, reps):
            out0 = fn(jnp.zeros((), jnp.float32))
            jax.block_until_ready(out0)
            # bitwise-distinct per-rep inputs (no chaining): the
            # tunneled runtime value-caches identical dispatches and
            # adds latency to dependent ones — MEASUREMENT.md.  The
            # jitter is applied MULTIPLICATIVELY by every fn below
            # (x * (1 + jit)): one-ulp relative, so the dispatch is
            # bitwise distinct for any input magnitude (an additive
            # 1e-12 vanishes against O(1) f32 values)
            jitters = [jnp.float32((i + 1) * 1.2e-7)
                       for i in range(reps)]
            jax.block_until_ready(jitters)
            best = np.inf
            for _ in range(2):
                t0 = time.perf_counter()
                for jit in jitters:
                    out = fn(jit)
                jax.block_until_ready(out)
                best = min(best,
                           (time.perf_counter() - t0) / reps)
            del out
            return out0, best

        techniques = {}
        techniques["vanilla"] = (None, None, 0.0)

        @jax.jit
        def jacobi_build(jit):
            return inv_diag * (1.0 + jit)

        md, setup_s = time_setup(jacobi_build, reps)

        def diag_apply(m_data, r):
            return m_data * r

        techniques["jacobi"] = (diag_apply, md, setup_s)

        setup_jit = jax.jit(
            lambda jit, params=None: structured_setup(
                jax.tree.map(
                    lambda x: (x * (1.0 + jit)
                               if x.dtype == jnp.float32 else x),
                    a,
                ),
                plan, params,
            )
        )

        def fsai_build(jit):
            return setup_jit(jit)

        (bands, q), setup_s = time_setup(fsai_build, reps)
        apply_fsai = make_structured_poly_apply(plan.offsets, 0)
        techniques["fsai"] = (apply_fsai, (bands, q, a), setup_s)

        setup_learned = jax.jit(
            lambda jit: structured_setup(
                jax.tree.map(
                    lambda x: (x * (1.0 + jit)
                               if x.dtype == jnp.float32 else x),
                    a,
                ),
                plan, params,
            )
        )
        (bands_l, q_l), setup_s = time_setup(setup_learned, reps)
        apply_learned = make_structured_poly_apply(plan.offsets, degree)
        techniques["learned"] = (apply_learned, (bands_l, q_l, a),
                                 setup_s)

        # flat single-system solvers: a B=1 batch wrapper degrades
        # the shifted-slice applies' fusion 5x (see
        # solvers/cg.pcg_fixed_trips docstring).  The untimed warm-up
        # while-loop measures needed iterations; the timed dispatch is
        # fixed-trip (a data-dependent while condition costs ~2 ms per
        # evaluation on the tunneled chip — it would dominate a
        # 6-iteration solve)
        for name, (apply_fn, m_data, setup_s) in techniques.items():
            kwargs = {}
            if apply_fn is not None:
                kwargs = {"apply_m": apply_fn, "m_data": m_data}
            warm = preconditioned_conjugate_gradient(
                matvec, a, b, rtol=rtol, **kwargs
            )
            jax.block_until_ready(warm.x)
            iters = int(warm.iterations)
            ok = float(warm.residual) < rtol
            trips = min(iters + 2, 1024)
            res = pcg_fixed_trips(
                matvec, a, b, rtol=rtol, trips=trips, **kwargs
            )
            jax.block_until_ready(res.x)
            # accuracy from the UNSCALED-b fixed-trip solve: the timed
            # variants below scale b by 1+k*1.2e-7, which would floor
            # the reported relative error near ~5e-7 regardless of the
            # actual solve accuracy (ADVICE r4 #2)
            err = float(jnp.linalg.norm(res.x[:n] - x_star[:n])
                        / np.linalg.norm(x_star[:n]))
            b_variants = [
                b * (1.0 + (i + 1) * jnp.float32(1.2e-7))
                for i in range(reps)
            ]
            jax.block_until_ready(b_variants)
            best = np.inf
            for _ in range(2):
                t0 = time.perf_counter()
                for b_rep in b_variants:
                    res = pcg_fixed_trips(
                        matvec, a, b_rep, rtol=rtol,
                        trips=trips, **kwargs
                    )
                jax.block_until_ready(res.x)
                best = min(best, (time.perf_counter() - t0) / reps)
            solve_s = best
            rows.append({
                "shape": f"{side}^3", "technique": name, "n": n,
                "iterations": iters,
                "setup_s": round(setup_s, 6),
                "solve_s": round(solve_s, 6),
                "total_s": round(setup_s + solve_s, 6),
                "converged": ok, "x_rel_err": round(err, 8),
            })
            details[f"{side}_{name}"] = {
                "it": iters, "total_ms": round(
                    (setup_s + solve_s) * 1e3, 1),
            }
            print(rows[-1], flush=True)

    if out is not None:
        out = Path(out)
        out.parent.mkdir(parents=True, exist_ok=True)
        keys = list(rows[0].keys())
        with out.open("w") as fio:
            fio.write(",".join(keys) + "\n")
            for r in rows:
                fio.write(",".join(str(r[k]) for k in keys) + "\n")
    return rows, details


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--shapes", default="64,128")
    parser.add_argument(
        "--ckpt",
        default=str(REPO / "assets" / "checkpoints_structured"
                    / "best.msgpack"),
    )
    parser.add_argument("--reps", type=int, default=4)
    parser.add_argument("--sigma", type=float, default=1.0,
                        help="coefficient-field contrast (lognormal "
                        "sigma; the checkpoint's training family) — "
                        "0 gives the constant-coefficient ladder")
    parser.add_argument("--rtol", type=float, default=1e-8)
    parser.add_argument(
        "--out",
        default=str(REPO / "assets" / "results"
                    / "scaling_learned.csv"),
    )
    parser.add_argument("--platform", default=None,
                        choices=["cpu", "tpu"])
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    _, details = run_scaling(
        [int(s) for s in args.shapes.split(",")],
        args.ckpt, sigma=args.sigma, reps=args.reps, rtol=args.rtol,
        out=args.out,
    )
    print("JSON:" + json.dumps(details), flush=True)


if __name__ == "__main__":
    main()
