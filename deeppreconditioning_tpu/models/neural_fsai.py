"""NeuralFSAI — FSAI local solves + a learned per-column refinement.

A third model family beyond the reference's two CNNs (framework
extension; reference model.py:13-179 only offers conv nets, whose output
pattern is the conv-dilated band — measurably weaker than the graph
pattern tril(|A|^3): FSAI on the graph pattern reaches ~28 CG iterations
on the FVM test split vs ~38 for the dilated-pattern optimum).

Architecture: the closed-form FSAI factor (ops/fsai.py — batched local
Cholesky solves, the exact Kaporin-optimal values on the pattern) is the
base; a small per-column MLP refines it:

    c_ref = c * exp(alpha)  on the diagonal slot (positivity preserved)
    c_ref = c * exp(alpha) + beta * c_diag  elsewhere on the pattern

with alpha, beta zero-initialized, so an *untrained* NeuralFSAI is
exactly FSAI — training can only move away from the classical optimum if
a different objective (e.g. inverse_loss, which targets the full spectrum
rather than Kaporin's trace/det ratio) says so.  M = C C^T stays SPD by
construction: the diagonal is c_d * exp(alpha) > 0.

Everything is (n_pad, w)-shaped with dataset-global static width w, so
the whole setup — local solves + MLP — is one compiled executable reused
across cases, exactly like the conv models' gather-GEMM plans.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from deeppreconditioning_tpu.ops.fsai import (
    FSAIPlan,
    RangeFSAIPlan,
    build_fsai_plan,
    build_range_fsai_plan,
    fsai_dense_factor,
    fsai_values,
    pattern_col_width,
    range_dense_factor,
    range_fsai_columns,
    tril_power_pattern,
)


class NeuralFSAI(nn.Module):
    """FSAI base + zero-init learned refinement (see module docstring).

    Call signature (single sample; vmap for batches):
        plan: FSAIPlan (operand = (nnz0_pad,) scaled tril values) or
            RangeFSAIPlan (operand = dense scaled symmetric matrix —
            the banded fast path, ops/fsai.py).  Column width must
            equal self.width in both cases.
    Returns (n_pad, w) refined column values of C.
    """

    width: int
    hidden: int = 64

    @nn.compact
    def __call__(self, plan, operand: jax.Array) -> jax.Array:
        w = self.width
        assert plan.width == w, (plan.width, w)
        if isinstance(plan, RangeFSAIPlan):
            c = range_fsai_columns(plan, operand)  # (n_pad, w)
        else:
            c = fsai_values(plan, operand)

        pad = plan.diag_pad
        pos1h = jax.nn.one_hot(plan.pos, w, dtype=c.dtype)
        c_diag = jnp.take_along_axis(c, plan.pos[:, None], axis=1)
        denom = jnp.maximum(jnp.abs(c_diag), 1e-20)
        feats = jnp.concatenate([c / denom, pos1h, pad], axis=1)

        h = nn.Dense(self.hidden, name="dense0")(feats)
        h = nn.gelu(h)
        h = nn.Dense(self.hidden, name="dense1")(h)
        h = nn.gelu(h)
        zeros = nn.initializers.zeros
        alpha = nn.Dense(
            w, kernel_init=zeros, bias_init=zeros, name="alpha"
        )(h)
        beta = nn.Dense(
            w, kernel_init=zeros, bias_init=zeros, name="beta"
        )(h)

        live = (plan.out_rows < plan.n_pad).astype(c.dtype) * (1.0 - pad)
        refined = c * jnp.exp(alpha) + (1.0 - pos1h) * beta * c_diag
        return refined * live


def batched_apply_fsai(model: NeuralFSAI, params, plans,
                       operands: jax.Array) -> jax.Array:
    """vmap the model over a batch of stacked plans + operands
    (value vectors for FSAIPlan, dense scaled A for RangeFSAIPlan)."""
    return jax.vmap(
        lambda p, v: model.apply(params, p, v)
    )(plans, operands)


def batched_dense_factor(plans, c_vals: jax.Array,
                         d_isqrt=None, n0=None) -> jax.Array:
    """vmapped dense C build -> (B, n_pad, n_pad), plan-type dispatched."""
    factor = (range_dense_factor
              if isinstance(plans, RangeFSAIPlan) else fsai_dense_factor)
    if d_isqrt is None:
        return jax.vmap(lambda p, c: factor(p, c))(plans, c_vals)
    return jax.vmap(factor)(plans, c_vals, d_isqrt, n0)


def stack_fsai_plans(plans: Sequence[FSAIPlan]) -> FSAIPlan:
    """Stack per-sample plans (same static shapes) into one batched plan."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *plans)


class FSAIPlanProvider:
    """Builds and caches batched FSAIPlans for a PlannedDataSet.

    The dataset's level-0 conv plan already carries the tril(A) sites in
    feature order; this provider derives the FSAI pattern/plan per sample
    and stacks them per batch — the FSAI analog of the dataset's conv
    plans (built once, reused every epoch).
    """

    def __init__(self, dataset, power: int = 3, width: int = 16,
                 range_h: int = 256, kind: str = "auto"):
        self.dataset = dataset
        self.power = power
        self.width = width
        self.range_h = range_h
        self.kind = kind  # "auto" | "range" | "generic"
        self._cache: dict = {}

    def _sample_plan(self, rows, cols, valid, n_pad, sentinel):
        nnz = int(valid.sum())
        r0 = rows[:nnz].astype(np.int32)
        c0 = cols[:nnz].astype(np.int32)
        pr, pc = tril_power_pattern(r0, c0, n_pad, power=self.power)
        need = pattern_col_width(pr, pc)
        if need > self.width:
            raise ValueError(
                f"fsai pattern width {need} exceeds configured width "
                f"{self.width}; raise params fsai_width"
            )
        if self.kind == "auto":
            try:
                plan = build_range_fsai_plan(
                    pr, pc, n_pad, width=self.width,
                    range_h=min(self.range_h, n_pad),
                )
                self.kind = "range"
                return plan
            except ValueError:
                self.kind = "generic"
        if self.kind == "range":
            return build_range_fsai_plan(
                pr, pc, n_pad, width=self.width,
                range_h=min(self.range_h, n_pad),
            )
        return build_fsai_plan(
            r0, c0, pr, pc, n_pad, width=self.width, sentinel=sentinel
        )

    def __call__(self, index: int, batch) -> FSAIPlan:
        # key on batch identity, not index: dataset views (train/val
        # splits) renumber batches but share the base dataset's lru cache
        del index
        key = id(batch.features)
        if key in self._cache:
            return self._cache[key]
        p0 = batch.plans[0]
        n_pad = batch.solutions.shape[1]
        sentinel = batch.features.shape[1]
        plans: List[FSAIPlan] = []
        for b in range(batch.features.shape[0]):
            plans.append(self._sample_plan(
                np.asarray(p0.rows[b]),
                np.asarray(p0.cols[b]),
                np.asarray(p0.valid[b]),
                n_pad,
                sentinel,
            ))
        plan = stack_fsai_plans(plans)
        self._cache[key] = plan
        return plan
