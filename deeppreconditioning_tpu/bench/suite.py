"""Preconditioner benchmark suite.

Port of the reference's BenchmarkSuite
(uibk/deep_preconditioning/test.py:31-198) with identical measured
quantities per technique — mean condition number kappa, density %, CG
iterations, setup seconds, solve seconds, total, success % — and the same
CSV artifacts (table.csv, totals.csv, eigenvalues.csv for case 0).

Techniques (test.py:42-49): vanilla, jacobi, incomplete_cholesky,
learned.  Differences from the reference, by design:

  * PCG runs on the TPU via the compiled lax.while_loop solver — one
    executable reused across all cases (static padded shapes), timed with
    block_until_ready after a warm-up call.
  * incomplete_cholesky is applied *correctly* as two level-scheduled
    triangular solves (z = L^-T L^-1 r) instead of the reference's
    z = (C C^T) r matvec (test.py:88) which preconditions with ~A rather
    than ~A^-1 and is flagged "unstable" there (test.py:46).  The
    reference-compatible apply is available as technique
    ``incomplete_cholesky_matvec`` for parity experiments.
  * kappa / spectrum are computed host-side in float64 (same math as
    torch.linalg.cond / svdvals, test.py:111-117).
"""

from __future__ import annotations

import csv
import functools
import time
from dataclasses import dataclass, field
from pathlib import Path
import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from deeppreconditioning_tpu.models.precond_net import (
    batched_apply,
    output_to_dense,
)
from deeppreconditioning_tpu.ops.amg import amg_apply, build_amg
from deeppreconditioning_tpu.ops.factor_apply import (
    build_factor_apply_plan,
    factor_normal_apply,
    pattern_widths,
)
from deeppreconditioning_tpu.ops.fsai import (
    build_fsai_plan,
    build_range_fsai_plan,
    fsai_dense_preconditioner,
    fsai_dense_preconditioner_range,
    pattern_col_width,
    tril_power_pattern,
)
from deeppreconditioning_tpu.ops.ic0 import (
    ic0_factor,
    ict_factor,
    jacobi_preconditioner,
)
from deeppreconditioning_tpu.ops.trisolve import (
    build_tri_neumann,
    build_tri_schedule,
    ic_apply,
    neumann_ic_apply,
    transpose_schedule,
)
from deeppreconditioning_tpu.solvers.cg import (
    dense_matvec,
    ell_matvec,
    identity_apply,
    preconditioned_conjugate_gradient,
)
from deeppreconditioning_tpu.sparse import ELLMatrix

RESULTS_DIRECTORY = Path("./assets/results/")


def _diag_apply(d, r):
    return d * r


@functools.partial(jax.jit, static_argnames=("model", "dtype"))
def _learned_factor_values(model, params, features, plans, scales, n0,
                           dtype=jnp.float32):
    """Model forward -> effective L values in factor form (no dense
    materialization, no n^3 matmul): the whole learned setup is this one
    compiled call.  Scaling fold and padding mask act per-entry:
    L_eff[i,j] = D_i^-1/2 * L~[i,j] for i,j < n0, else 0 — the factor
    form of the dense masking in _learned_setup_device."""
    values = batched_apply(model, params, features, plans)[0]
    final = jax.tree.map(lambda x: x[0], plans[-1])
    d_isqrt = 1.0 / jnp.sqrt(scales[0].astype(values.dtype))
    mask = (final.rows < n0) & (final.cols < n0)
    values = values * d_isqrt[final.rows] * mask
    return values.astype(dtype)


@functools.partial(jax.jit, static_argnames=("model", "dtype"))
def _learned_setup_device(model, params, features, plans, scales, n0,
                          dtype=jnp.float32):
    """Model forward -> masked effective preconditioner, one compiled
    executable reused across all cases (shapes are dataset-global; n0 is
    a traced scalar so per-case dof changes don't retrace)."""
    values = batched_apply(model, params, features, plans)
    n = scales.shape[1]
    l_dense = output_to_dense(values, plans[-1], n)
    # fold the dataset's Jacobi scaling into the preconditioner:
    # M_eff = D^-1/2 (L~ L~^T) D^-1/2 ~ A^-1
    d_isqrt = 1.0 / jnp.sqrt(scales[0].astype(l_dense.dtype))
    l_eff = d_isqrt[:, None] * l_dense[0]
    # zero coupling into padding rows (conv dilation activates sites
    # beyond n0; leaving them in would make CG iterate on a singular
    # padded subspace)
    mask = jnp.arange(n) < n0
    l_eff = jnp.where(mask[:, None], l_eff, 0.0)
    l_eff = jnp.where(mask[None, :] | jnp.eye(n, dtype=bool), l_eff, 0.0)
    m = l_eff @ l_eff.T
    m = jnp.where(mask[:, None] & mask[None, :], m, 0.0)
    return m.astype(dtype), jnp.count_nonzero(m)


@functools.partial(jax.jit, static_argnames=("dtype",))
def _fsai_setup_device(plan, l0_vals, scales, n0, dtype=jnp.float32):
    """FSAI setup as one compiled call: batched local solves on the
    scaled system, scaling folded back (C_raw = D^-1/2 C_scaled) and
    padding masked — the classical counterpart of the learned setup."""
    d_isqrt = 1.0 / jnp.sqrt(scales.astype(l0_vals.dtype))
    return fsai_dense_preconditioner(
        plan, l0_vals, d_isqrt=d_isqrt, n0=n0, dtype=dtype
    )


@functools.partial(jax.jit, static_argnames=("dtype",))
def _fsai_range_setup_device(plan, a_dense, scales, n0,
                             dtype=jnp.float32):
    """Range-blocked FSAI setup (banded orderings) — see ops/fsai.py."""
    d_isqrt = 1.0 / jnp.sqrt(scales.astype(dtype))
    return fsai_dense_preconditioner_range(
        plan, a_dense, d_isqrt=d_isqrt, n0=n0, dtype=dtype
    )


@functools.partial(jax.jit, static_argnames=("model", "dtype"))
def _neural_fsai_setup_device(model, params, plan, operand, scales, n0,
                              dtype=jnp.float32):
    """Learned setup for the NeuralFSAI family: base local solves +
    refinement MLP + learned polynomial wrap -> dense effective M on the
    raw system (models/neural_fsai.neural_fsai_dense_preconditioner)."""
    from deeppreconditioning_tpu.models.neural_fsai import (
        neural_fsai_dense_preconditioner,
    )

    return neural_fsai_dense_preconditioner(
        model, params, plan, operand, scales, n0, dtype=dtype
    )


def _tri_apply(md, r):
    return ic_apply(md[0], md[1], r)


def _neumann_apply(md, r):
    return neumann_ic_apply(md, r)


def _amg_apply(md, r):
    return amg_apply(md, r)


@dataclass
class BenchmarkSuite:
    """Benchmark learned vs classical preconditioners on a test set.

    Args:
        data_set: a PlannedDataSet with batch_size=1 (test.py:63 asserts
            the same).
        model: PreconditionerNet (or None to skip 'learned').
        params: trained model parameters.
    """

    data_set: object
    model: object = None
    params: object = None
    techniques: tuple = (
        "vanilla",
        "jacobi",
        "incomplete_cholesky",
        "learned",
    )
    max_iter: int = 1024
    rtol: float = 1e-8
    dtype: object = jnp.float32
    learned_apply: str = "dense"  # "dense" (n^2 matvec, best at bench
    # sizes) or "factor" (gather-based z = L (L^T r), best at large n)
    fsai_power: int = 4  # FSAI pattern = tril(|A|^power); 4 is the
    # measured total-time sweet spot on the FVM suite (23 iters at a
    # dispatch-floor setup; power 5 trades 4 fewer iters for +0.4 ms
    # setup, power 3 runs 5 more iters)
    learned_power: int = 0  # pattern power of the NeuralFSAI learned
    # technique (its training-time choice, baked into the checkpoint);
    # 0 -> same as fsai_power.  Kept separate so the classical fsai
    # baseline always runs at its own total-time optimum.
    ic_neumann_sweeps: int = 8  # truncated-Neumann IC apply order
    # (incomplete_cholesky_neumann technique): 8 sweeps cover the bulk
    # of the FVM factors' dependency depth at 16 fused matvecs/apply
    check_every: int = 8  # CG chunk length: solves are quantized to
    # chunk boundaries (masked fixed-trip iterations), so strong
    # preconditioners benefit from finer chunks; 8 is best for the
    # 20-40-iteration regime on the measured v5e
    timing_reps: int = 30  # amortize device-sync latency: one
    # block_until_ready costs ~35ms through a tunneled chip (vs ~0.1ms
    # of actual solve compute), so solves/setups are timed as R
    # dependency-chained repetitions with a single final sync
    kappa_cases: int = 5  # dense-SVD kappa/spectrum only for this many
    # leading cases — O(n^3) per case; the reference pays it everywhere
    # (test.py:139) because its GPU sits otherwise idle during CPU PCG
    results_directory: Path = RESULTS_DIRECTORY
    kappas: dict = field(default_factory=dict)
    densities: dict = field(default_factory=dict)
    iterations: dict = field(default_factory=dict)
    setups: dict = field(default_factory=dict)
    durations: dict = field(default_factory=dict)
    totals: dict = field(default_factory=dict)
    successes: dict = field(default_factory=dict)

    def __post_init__(self):
        assert self.data_set.batch_size == 1, "Set batch size to one"
        if self.params is not None:
            # commit weights to device once — numpy leaves would be
            # re-transferred on every dispatch
            self.params = jax.device_put(self.params)
        for name in self.techniques:
            for store in (self.kappas, self.densities, self.iterations,
                          self.setups, self.durations, self.totals,
                          self.successes):
                store[name] = []

    # -- system reconstruction (test.py:61-68) ---------------------------
    def _reconstruct(self, batch):
        """Rebuild the RAW system A = D^1/2 A~ D^1/2, b = D^1/2 b~.

        All techniques compete on the unscaled system; the dataset's
        symmetric Jacobi normalization is a *component of the learned
        technique* (folded into its apply in _setup_learned), not a
        freebie for the classical baselines.
        """
        n0 = batch.original_sizes[0]
        tril = np.asarray(batch.systems.to_dense(), np.float64)[0]
        d_sqrt = np.sqrt(np.asarray(batch.scales[0], np.float64))
        a_full = tril + np.tril(tril, -1).T
        a_full = a_full * np.outer(d_sqrt, d_sqrt)
        a_sp = sp.csr_matrix(a_full[:n0, :n0])
        rhs = (
            np.asarray(batch.right_hand_sides[0], np.float64) * d_sqrt
        )[:n0]
        return a_sp, a_full, rhs, n0

    # -- preconditioner constructors -------------------------------------
    def _setup_vanilla(self, a_sp, batch, ell, need_dense,
                       timing=False):
        if timing:
            return identity_apply, None, None, None
        return identity_apply, None, float(a_sp.shape[0]) / (
            a_sp.shape[0] ** 2
        ) * 100, sp.eye(a_sp.shape[0]).tocsr()

    def _setup_jacobi(self, a_sp, batch, ell, need_dense,
                      timing=False):
        d = np.zeros(ell.n_pad)
        n0 = a_sp.shape[0]
        d[:n0] = jacobi_preconditioner(a_sp)
        d[n0:] = 0.0
        if timing:
            return _diag_apply, jnp.asarray(d, self.dtype), None, None
        dens = 100.0 * n0 / (n0 * n0)
        m_sp = sp.diags(d[:n0]).tocsr()
        return _diag_apply, jnp.asarray(d, self.dtype), dens, m_sp

    def _setup_incomplete_cholesky(self, a_sp, batch, ell,
                                   need_dense, timing=False):
        l = ic0_factor(a_sp)
        lower = build_tri_schedule(l, n_pad=ell.n_pad)
        upper = transpose_schedule(l, n_pad=ell.n_pad)
        lower = jax.tree.map(
            lambda x: x.astype(self.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, lower)
        upper = jax.tree.map(
            lambda x: x.astype(self.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, upper)
        if timing:
            return _tri_apply, (lower, upper), None, None
        n0 = a_sp.shape[0]
        dens = 100.0 * l.nnz / (n0 * n0)
        if need_dense:  # M = L^-T L^-1 materialized for kappa only
            linv = sp.linalg.spsolve_triangular(
                l.tocsr(), np.eye(n0), lower=True
            )
            m_sp = sp.csr_matrix(linv.T @ linv)
        else:
            m_sp = None
        return _tri_apply, (lower, upper), dens, m_sp

    def _setup_incomplete_cholesky_neumann(self, a_sp, batch, ell,
                                           need_dense, timing=False):
        """IC(0) applied via truncated Neumann/Jacobi sweeps
        (trisolve.py:247-278) instead of level-scheduled tri-solves —
        the latency-optimal apply on TPU: ``2 * ic_neumann_sweeps``
        fused ELL matvecs with a fixed trip count, versus one
        sequential wave per dependency level.  Truncation keeps the
        operator SPD (z = P(L)^T P(L) r), so PCG is safe; it costs a
        few extra CG iterations and wins on wall clock."""
        l = ic0_factor(a_sp)
        op = build_tri_neumann(
            l, sweeps=self.ic_neumann_sweeps, n_pad=ell.n_pad
        )
        op = jax.tree.map(
            lambda x: x.astype(self.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, op)
        if timing:
            return _neumann_apply, op, None, None
        n0 = a_sp.shape[0]
        dens = 100.0 * l.nnz / (n0 * n0)
        m_sp = None
        if need_dense:  # M columns by applying to identity (one vmap)
            eye = jnp.eye(ell.n_pad, dtype=self.dtype)
            m_cols = jax.vmap(lambda e: neumann_ic_apply(op, e))(eye)
            m_sp = sp.csr_matrix(
                np.asarray(m_cols, np.float64).T[:n0, :n0]
            )
        return _neumann_apply, op, dens, m_sp

    def _setup_incomplete_lu(self, a_sp, batch, ell, need_dense,
                             timing=False):
        """ILUT-analog baseline (test.py:90-93): for SPD input the ILU
        factors coincide with the ICT pair (L, L^T), applied as two
        triangular solves."""
        l = ict_factor(a_sp, add_fill_in=1, threshold=0.1)
        lower = build_tri_schedule(l, n_pad=ell.n_pad)
        upper = transpose_schedule(l, n_pad=ell.n_pad)
        lower = jax.tree.map(
            lambda x: x.astype(self.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, lower)
        upper = jax.tree.map(
            lambda x: x.astype(self.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, upper)
        if timing:
            return _tri_apply, (lower, upper), None, None
        n0 = a_sp.shape[0]
        dens = 100.0 * l.nnz / (n0 * n0)
        if need_dense:
            linv = sp.linalg.spsolve_triangular(
                l.tocsr(), np.eye(n0), lower=True
            )
            m_sp = sp.csr_matrix(linv.T @ linv)
        else:
            m_sp = None
        return _tri_apply, (lower, upper), dens, m_sp

    def _setup_algebraic_multigrid(self, a_sp, batch, ell, need_dense,
                                   timing=False):
        """Aggregation-AMG V-cycle (replaces the disabled pyamg baseline,
        test.py:95-98) — ops/amg.py."""
        m = build_amg(a_sp, n_pad=ell.n_pad, dtype=self.dtype)
        if timing:
            return _amg_apply, m, None, None
        n0 = a_sp.shape[0]
        nc = m.coarse_inv.shape[0]
        dens = 100.0 * (a_sp.nnz + nc * nc) / (n0 * n0)
        m_sp = None
        if need_dense:
            cols = []
            eye = np.eye(ell.n_pad)
            for j in range(n0):
                z = np.asarray(amg_apply(m, jnp.asarray(
                    eye[j], self.dtype)))
                cols.append(z[:n0])
            m_sp = sp.csr_matrix(np.column_stack(cols))
        return _amg_apply, m, dens, m_sp

    def _learned_widths(self):
        """Dataset-global (w_lower, w_upper) of the final-plan pattern —
        static so one compiled factor apply serves every case."""
        if getattr(self, "_fw_cache", None) is None:
            w_l, w_u = 1, 1
            for index in range(len(self.data_set)):
                fin = self.data_set[index].plans[-1]
                for b in range(np.asarray(fin.rows).shape[0]):
                    wl, wu = pattern_widths(
                        np.asarray(fin.rows[b]),
                        np.asarray(fin.cols[b]),
                        np.asarray(fin.valid[b]),
                    )
                    w_l, w_u = max(w_l, wl), max(w_u, wu)
            self._fw_cache = (w_l, w_u)
        return self._fw_cache

    def _learned_plan(self, batch, ell):
        """Per-case FactorApplyPlan (pattern-only, dataset-derived — the
        analog of batch.plans, so built outside the timed setup)."""
        fin = batch.plans[-1]
        key = id(fin.rows)
        cache = getattr(self, "_fp_cache", None)
        if cache is None:
            cache = self._fp_cache = {}
        if key not in cache:
            cache[key] = build_factor_apply_plan(
                np.asarray(fin.rows[0]),
                np.asarray(fin.cols[0]),
                np.asarray(fin.valid[0]),
                ell.n_pad,
                widths=self._learned_widths(),
            )
        return cache[key]

    # -- FSAI (TPU-native extension; ops/fsai.py) -------------------------
    def _fsai_meta(self, ell, power):
        """Dataset-global pattern metadata for one pattern power:
        (static column width, range height, per-case pattern dict)."""
        cache = getattr(self, "_fsai_meta_cache", None)
        if cache is None:
            cache = self._fsai_meta_cache = {}
        if power not in cache:
            ds_width, spread = 1, 1
            pats = []
            # range-path eligibility cutoff: one permuted/unstructured
            # case must not inflate the global slab height H for the
            # whole dataset — cases wider than this fall back to the
            # generic element-gather plan individually
            spread_cap = max(ell.n_pad // 4, 128)
            for index in range(len(self.data_set)):
                b = self.data_set[index]
                r0, c0, nnz0 = self._l0_sites(b)
                pr, pc = tril_power_pattern(
                    r0, c0, ell.n_pad, power=power
                )
                ds_width = max(ds_width, pattern_col_width(pr, pc))
                blk = pc // 8
                case_spread = 1
                for bi in np.unique(blk):
                    sel = blk == bi
                    case_spread = max(
                        case_spread,
                        int(pr[sel].max() - pr[sel].min() + 1),
                    )
                if case_spread <= spread_cap:
                    spread = max(spread, case_spread)
                pats.append((id(b.features), r0, c0, pr, pc, nnz0))
            cache[power] = (
                ds_width,
                int(np.ceil(spread / 128) * 128),
                {p[0]: p[1:] for p in pats},
            )
        return cache[power]

    def _fsai_plan(self, batch, ell, width=None, power=None):
        """Per-case FSAI plan + untimed input artifacts.

        Pattern plans and the dense scaled-matrix form are dataset-level
        input prep (the analog of batch.plans / the solver's ELL form),
        built outside the timed setup.  Returns
        (kind, plan, operand, scales): kind "range" (banded fast path,
        operand = dense scaled A) or "generic" (operand = l0 values).
        ``width`` overrides the dataset-global column width and ``power``
        the pattern power (a trained NeuralFSAI bakes both into its
        parameters)."""
        power = self.fsai_power if power is None else power
        key = (id(batch.features), width, power)
        cache = getattr(self, "_fsai_cache", None)
        if cache is None:
            # bounded LRU: a RangeFSAIPlan one-hot is O(n_pad*H*w) —
            # tens of MB of HBM per case; plans are only reused within
            # one case's timing reps, so keep the last few, not all
            from collections import OrderedDict

            cache = self._fsai_cache = OrderedDict()
        if key in cache:
            cache.move_to_end(key)
        else:
            while len(cache) >= 4:
                cache.popitem(last=False)
            ds_width, range_h, pats = self._fsai_meta(ell, power)
            eff_width = ds_width if width is None else width
            self._fsai_range_h = range_h
            r0, c0, pr, pc, nnz0 = pats[id(batch.features)]
            scales0 = batch.scales[0]
            if eff_width < pattern_col_width(pr, pc):
                # learned width is baked into the checkpoint; cap the
                # pattern to the trained width (strongest couplings per
                # column) instead of refusing out-of-distribution cases
                # — same fallback as scripts/compare_meshes.py
                from deeppreconditioning_tpu.ops.fsai import (
                    tril_power_pattern_capped,
                )

                nnz = r0.shape[0]
                mags = np.asarray(
                    batch.features[0, :nnz, 0], np.float64
                )
                pr, pc = tril_power_pattern_capped(
                    r0, c0, mags, ell.n_pad,
                    power=power, width=eff_width,
                )
            try:
                plan = build_range_fsai_plan(
                    pr, pc, ell.n_pad,
                    width=eff_width,
                    range_h=min(self._fsai_range_h, ell.n_pad),
                )
                # dense scaled A~ from host values (untimed input prep)
                nnz = r0.shape[0]
                vals = np.asarray(batch.features[0, :nnz, 0],
                                  np.float64)
                a_d = np.zeros((ell.n_pad, ell.n_pad))
                a_d[r0, c0] = vals
                a_d = a_d + np.tril(a_d, -1).T
                cache[key] = (
                    "range", plan,
                    jnp.asarray(a_d, jnp.float32), scales0,
                )
            except ValueError:
                plan = build_fsai_plan(
                    r0, c0, pr, pc, ell.n_pad,
                    width=eff_width,
                    sentinel=nnz0,
                )
                # hoist the device slices: per-call batch.features[0,:,0]
                # would dispatch a fresh slice kernel every timed rep
                cache[key] = (
                    "generic", plan, batch.features[0, :, 0], scales0,
                )
        return cache[key]

    @staticmethod
    def _l0_sites(batch):
        """Valid level-0 tril sites of a batch (host numpy), in the
        feature-vector order, plus the feature bucket size."""
        p0 = batch.plans[0]
        rows = np.asarray(p0.rows[0])
        cols = np.asarray(p0.cols[0])
        valid = np.asarray(p0.valid[0])
        nnz = int(valid.sum())
        return (rows[:nnz].astype(np.int32),
                cols[:nnz].astype(np.int32),
                batch.features.shape[1])

    def _setup_fsai(self, a_sp, batch, ell, need_dense, timing=False):
        n0 = a_sp.shape[0]
        if getattr(self, "_n0_cache", None) != n0:
            self._n0_dev = jnp.int32(n0)
            self._n0_cache = n0
        kind, plan, operand, scales0 = self._fsai_plan(batch, ell)
        setup_fn = (_fsai_range_setup_device if kind == "range"
                    else _fsai_setup_device)
        m = setup_fn(
            plan, operand, scales0, self._n0_dev, dtype=self.dtype,
        )
        if timing:
            return dense_matvec, m, None, None
        if need_dense:
            m_np = np.asarray(m, np.float64)
            m_sp = sp.csr_matrix(m_np[:n0, :n0])
            dens = 100.0 * m_sp.nnz / (n0 * n0)
        else:
            m_sp = None
            dens = float(jnp.count_nonzero(m)) * 100.0 / (n0 * n0)
        return dense_matvec, m, dens, m_sp

    def _setup_learned(self, a_sp, batch, ell, need_dense,
                       timing=False):
        """Learned technique dispatch: conv families (dense/factor
        apply) or NeuralFSAI (local solves + refinement MLP)."""
        from deeppreconditioning_tpu.models.neural_fsai import NeuralFSAI

        if isinstance(self.model, NeuralFSAI):
            return self._setup_learned_neural_fsai(
                a_sp, batch, ell, need_dense, timing
            )
        return self._setup_learned_conv(
            a_sp, batch, ell, need_dense, timing
        )

    def _setup_learned_neural_fsai(self, a_sp, batch, ell, need_dense,
                                   timing=False):
        n0 = a_sp.shape[0]
        if getattr(self, "_n0_cache", None) != n0:
            self._n0_dev = jnp.int32(n0)
            self._n0_cache = n0
        kind, plan, operand, scales0 = self._fsai_plan(
            batch, ell, width=self.model.width,
            power=self.learned_power or None,
        )
        m = _neural_fsai_setup_device(
            self.model, self.params, plan, operand, scales0,
            self._n0_dev, dtype=self.dtype,
        )
        if timing:
            return dense_matvec, m, None, None
        if need_dense:
            m_np = np.asarray(m, np.float64)
            m_sp = sp.csr_matrix(m_np[:n0, :n0])
            dens = 100.0 * m_sp.nnz / (n0 * n0)
        else:
            m_sp = None
            dens = float(jnp.count_nonzero(m)) * 100.0 / (n0 * n0)
        return dense_matvec, m, dens, m_sp

    def _setup_learned_conv(self, a_sp, batch, ell, need_dense,
                            timing=False):
        """Learned technique, dense apply (z = M @ r, M = L L^T).

        Benchmark-size systems (n_pad ~ 1k) favor the dense apply on
        TPU: an n^2 f32 matvec is one MXU-friendly fusion (~37 us) while
        XLA lowers the factor-form 2-D gathers to near-serial loads
        (~240 us measured).  ``apply="factor"`` switches to the
        gather-based factor apply (ops/factor_apply.py) — the right
        trade once n^2 dwarfs nnz (large/distributed systems)."""
        n0 = a_sp.shape[0]
        # hoist the per-case scalar to one transfer (repeated np scalar
        # creation is a fresh H2D round trip per call on a tunneled chip)
        if getattr(self, "_n0_cache", None) != n0:
            self._n0_dev = jnp.int32(n0)
            self._n0_cache = n0
        if self.learned_apply == "factor":
            plan = self._learned_plan(batch, ell)
            vals = _learned_factor_values(
                self.model, self.params, batch.features, batch.plans,
                batch.scales, self._n0_dev, dtype=self.dtype,
            )
            apply_m, m_data = factor_normal_apply, (plan, vals)
            m = None
        else:
            m, nnz = _learned_setup_device(
                self.model, self.params, batch.features, batch.plans,
                batch.scales, self._n0_dev, dtype=self.dtype,
            )
            assert m.shape[0] == ell.n_pad, (
                "suite expects dataset-global padding == solver padding"
            )
            apply_m, m_data = dense_matvec, m
        if timing:
            return apply_m, m_data, None, None
        if need_dense:
            if m is None:
                m, _ = _learned_setup_device(
                    self.model, self.params, batch.features, batch.plans,
                    batch.scales, self._n0_dev, dtype=self.dtype,
                )
            m_np = np.asarray(m, np.float64)
            m_sp = sp.csr_matrix(m_np[:n0, :n0])
            dens = 100.0 * m_sp.nnz / (n0 * n0)
        else:
            m_sp = None
            if m is not None:
                # device scalar — converted outside the timed region
                dens = float(jnp.count_nonzero(m)) * 100.0 / (n0 * n0)
            else:
                fin = batch.plans[-1]
                keep = (np.asarray(fin.valid[0])
                        & (np.asarray(fin.rows[0]) < n0)
                        & (np.asarray(fin.cols[0]) < n0))
                l_pat = sp.csr_matrix(
                    (np.ones(int(keep.sum())),
                     (np.asarray(fin.rows[0])[keep],
                      np.asarray(fin.cols[0])[keep])),
                    shape=(n0, n0),
                )
                dens = 100.0 * (l_pat @ l_pat.T).nnz / (n0 * n0)
        return apply_m, m_data, dens, m_sp

    # -- measurement ------------------------------------------------------
    def _solve(self, ell, b_dev, apply_m, m_data):
        res = preconditioned_conjugate_gradient(
            ell_matvec, ell, b_dev, apply_m, m_data,
            rtol=self.rtol, max_iter=self.max_iter,
            check_every=self.check_every,
        )
        jax.block_until_ready(res)
        return res

    def run(self, verbose: bool = False) -> None:
        eigenvalues = {}
        # global warm-up on case 0 so per-case setup/solve timings are
        # steady-state (XLA compiles once; static shapes keep it cached)
        if len(self.data_set):
            batch0 = self.data_set[0]
            a0, _, rhs0, n00 = self._reconstruct(batch0)
            ell0 = ELLMatrix.from_scipy(
                a0, n_pad=batch0.solutions.shape[1], dtype=self.dtype
            )
            b0 = np.zeros(ell0.n_pad)
            b0[:n00] = rhs0
            for name in self.techniques:
                apply_m, m_data, _, _ = getattr(self, f"_setup_{name}")(
                    a0, batch0, ell0, False
                )
                self._solve(ell0, jnp.asarray(b0, self.dtype), apply_m,
                            m_data)
        for index in range(len(self.data_set)):
            batch = self.data_set[index]
            a_sp, a_full, rhs, n0 = self._reconstruct(batch)

            # dataset-global padded size -> one compiled solver for all
            # cases regardless of per-case dof
            ell = ELLMatrix.from_scipy(
                a_sp, n_pad=batch.solutions.shape[1], dtype=self.dtype
            )
            b = np.zeros(ell.n_pad)
            b[:n0] = rhs
            b_dev = jnp.asarray(b, self.dtype)

            for name in self.techniques:
                need_dense = index < self.kappa_cases
                setup_fn = getattr(self, f"_setup_{name}")
                # untimed per-case warm call: index plans / pattern
                # artifacts are dataset-level input prep (the analog of
                # the solver's ELL form), built lazily on first touch —
                # keep that host work out of the setup timing
                apply_m, m_data, _, _ = setup_fn(
                    a_sp, batch, ell, False, timing=True
                )
                jax.block_until_ready(m_data)
                start = time.perf_counter()
                for _ in range(self.timing_reps):
                    apply_m, m_data, _, _ = setup_fn(
                        a_sp, batch, ell, need_dense, timing=True
                    )
                jax.block_until_ready(m_data)
                setup = ((time.perf_counter() - start) /
                         self.timing_reps if name != "vanilla" else 0.0)
                # statistics pass, outside the timed region
                apply_m, m_data, density, m_sp = setup_fn(
                    a_sp, batch, ell, need_dense
                )
                density = float(density)

                # warm-up (compile+transfer) then amortized timed runs
                res = self._solve(ell, b_dev, apply_m, m_data)
                start = time.perf_counter()
                for _ in range(self.timing_reps):
                    res = preconditioned_conjugate_gradient(
                        ell_matvec, ell, b_dev, apply_m, m_data,
                        rtol=self.rtol, max_iter=self.max_iter,
                        check_every=self.check_every,
                    )
                jax.block_until_ready(res)
                duration = (
                    time.perf_counter() - start
                ) / self.timing_reps

                if need_dense and m_sp is not None:
                    ma = (m_sp @ a_sp).toarray()
                    kappa = float(np.linalg.cond(ma))
                    if index == 0:
                        eigenvalues[name] = np.linalg.svd(
                            ma, compute_uv=False
                        ).tolist()
                else:
                    kappa = float("nan")

                success = float(res.residual) < self.rtol
                self.kappas[name].append(kappa)
                self.densities[name].append(density)
                self.iterations[name].append(int(res.iterations))
                self.setups[name].append(setup)
                self.durations[name].append(duration)
                self.totals[name].append(setup + duration)
                self.successes[name].append(100.0 * success)
                if verbose:
                    print(f"case {index} {name}: iters="
                          f"{int(res.iterations)} kappa={kappa:.3g} "
                          f"solve={duration*1e3:.2f}ms")

            if index == 0:
                self.results_directory.mkdir(parents=True, exist_ok=True)
                with (self.results_directory
                      / "eigenvalues.csv").open("w") as fio:
                    writer = csv.writer(fio)
                    writer.writerow(eigenvalues.keys())
                    writer.writerows(zip(*eigenvalues.values()))

    def summary(self) -> dict:
        """Mean of every measured quantity per technique."""
        out = {}
        for name in self.techniques:
            kap = np.asarray(self.kappas[name], float)
            out[name] = {
                "kappa": (float(np.nanmean(kap))
                          if np.isfinite(kap).any() else float("nan")),
                "density": float(np.mean(self.densities[name])),
                "iterations": float(np.mean(self.iterations[name])),
                "setup": float(np.mean(self.setups[name])),
                "duration": float(np.mean(self.durations[name])),
                "total": float(np.mean(self.totals[name])),
                "success": float(np.mean(self.successes[name])),
            }
        return out

    def plot_histograms(self):
        """Box-plot generator for durations/iterations
        (test.py:157-173 parity; the reference defines but never calls
        it — callers may save the yielded figures)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for parameter, label in zip(
            ["durations", "iterations"],
            ["Durations [ms]", "Iterations [-]"],
        ):
            figure, ax = plt.subplots()
            ax.set_ylabel(label)
            ax.boxplot(
                [getattr(self, parameter)[name]
                 for name in self.techniques],
                notch=True,
                tick_labels=self.techniques,
            )
            yield parameter, figure

    def dump_csv(self) -> None:
        """table.csv + totals.csv in the reference's schema
        (test.py:175-198)."""
        self.results_directory.mkdir(parents=True, exist_ok=True)
        parameters = ["kappas", "densities", "iterations", "setups",
                      "durations", "totals", "successes"]
        with (self.results_directory / "table.csv").open("w") as fio:
            fio.write("technique," + ",".join(parameters) + "\n")
            for technique in self.techniques:
                line = technique
                for parameter in parameters:
                    line += "," + str(
                        np.nanmean(np.asarray(
                            getattr(self, parameter)[technique],
                            dtype=float))
                    )
                fio.write(line + "\n")
        with (self.results_directory / "totals.csv").open("w") as fio:
            fio.write(",".join(self.techniques) + "\n")
            for index in range(len(self.totals[self.techniques[0]])):
                fio.write(",".join(
                    str(self.totals[t][index]) for t in self.techniques
                ) + "\n")
