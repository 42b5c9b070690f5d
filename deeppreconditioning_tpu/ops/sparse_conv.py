"""Sparse 2-D convolution as gather-GEMM over precomputed index plans.

TPU-native replacement for the spconv CUDA engine the reference model rides
on (reference: uibk/deep_preconditioning/model.py:27-40 uses
``spconv.SparseConv2d`` with kernel sizes 1 and 2 and asymmetric padding).

Design: spconv splits sparse convolution into (a) a host/native "indice
generation" step that builds gather/scatter index pairs from the sparsity
pattern and (b) device gather-GEMM-scatter using those pairs.  XLA wants
static shapes, so we make the split explicit and ahead-of-time:

  * `build_conv_plan` (host, numpy / native C++) computes, per layer, the
    dilated output active set and one gather map per kernel offset.  A
    matrix's sparsity pattern is fixed for its lifetime, so plans are built
    once per sample and cached — unlike the reference, which regenerates
    indices every forward pass.
  * `apply_sparse_conv` (device) computes
    ``out = sum_k  features[gather[k]] @ W[k] + b`` — K gathers plus K
    (nnz x Cin) @ (Cin x Cout) matmuls that XLA fuses and tiles onto the
    MXU.  Because stride is 1 and each output site receives at most one
    contribution per kernel offset, no scatter is needed at all.

nnz is padded to static buckets; the sentinel gather index points at an
all-zero feature row, so padding is inert.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@dataclass(frozen=True)
class ConvSpec:
    """Static description of one sparse-conv layer (stride fixed to 1)."""

    kernel: Tuple[int, int]
    padding: Tuple[int, int]

    def out_shape(self, hw: Tuple[int, int]) -> Tuple[int, int]:
        kh, kw = self.kernel
        ph, pw = self.padding
        return (hw[0] + 2 * ph - kh + 1, hw[1] + 2 * pw - kw + 1)


@struct.dataclass
class LayerPlan:
    """Device-side index plan for one conv layer on one sample.

    Attributes:
        gather: int32 (K, nnz_out_pad) — for each kernel offset, the index
            into the (zero-row-extended) input feature array; sentinel =
            nnz_in_pad points at the zero row.
        rows, cols: int32 (nnz_out_pad,) — output site coordinates.
        valid: bool (nnz_out_pad,) — real output sites.
    """

    gather: jax.Array
    rows: jax.Array
    cols: jax.Array
    valid: jax.Array


def _build_layer_plan_np(
    rows: np.ndarray,
    cols: np.ndarray,
    hw_in: Tuple[int, int],
    spec: ConvSpec,
) -> tuple:
    """Compute output active set + gather maps for one layer (host).

    Output site (i, j) is produced by input sites (i - ph + ki, j - pw + kj)
    for kernel offsets (ki, kj) — ordinary (not submanifold) convolution, so
    the output set is the input set dilated by the kernel footprint, exactly
    the active-set semantics of spconv's SparseConv2d.

    Uses the native C++ builder (native/src/dptpu.cpp dptpu_conv_plan)
    when libdptpu.so is built, numpy otherwise.  rows/cols must be sorted
    by linearized id (datasets guarantee this; the numpy path re-sorts).
    """
    kh, kw = spec.kernel
    ph, pw = spec.padding
    h_out, w_out = spec.out_shape(hw_in)
    w_in = hw_in[1]

    from deeppreconditioning_tpu import native

    if native.available() and rows.shape[0] > 0:
        lin = rows.astype(np.int64) * w_in + cols
        if np.all(lin[:-1] <= lin[1:]):
            out_rows, out_cols, gather = native.conv_plan(
                rows, cols, hw_in[0], w_in, kh, kw, ph, pw
            )
            return out_rows, out_cols, gather, (h_out, w_out)

    lin_in = rows.astype(np.int64) * w_in + cols
    order = np.argsort(lin_in, kind="stable")
    lin_sorted = lin_in[order]

    # output active set: union of shifted input sites, clipped to bounds
    out_lin_parts = []
    for ki in range(kh):
        for kj in range(kw):
            ro = rows + ph - ki
            co = cols + pw - kj
            ok = (ro >= 0) & (ro < h_out) & (co >= 0) & (co < w_out)
            out_lin_parts.append(ro[ok].astype(np.int64) * w_out + co[ok])
    out_lin = np.unique(np.concatenate(out_lin_parts))
    out_rows = (out_lin // w_out).astype(np.int32)
    out_cols = (out_lin % w_out).astype(np.int32)
    nnz_out = out_lin.shape[0]

    # gather map per offset
    nnz_in = rows.shape[0]
    gather = np.empty((kh * kw, nnz_out), np.int32)
    for k, (ki, kj) in enumerate(
        (ki, kj) for ki in range(kh) for kj in range(kw)
    ):
        ri = out_rows - ph + ki
        ci = out_cols - pw + kj
        inb = (ri >= 0) & (ri < hw_in[0]) & (ci >= 0) & (ci < w_in)
        cand = ri.astype(np.int64) * w_in + ci
        pos = np.searchsorted(lin_sorted, cand)
        pos_c = np.clip(pos, 0, nnz_in - 1)
        found = inb & (pos < nnz_in) & (lin_sorted[pos_c] == cand)
        gather[k] = np.where(found, order[pos_c], -1)
    return out_rows, out_cols, gather, (h_out, w_out)


@dataclass
class SamplePlanHost:
    """Host-side plan for a full network on one sample (pre-padding)."""

    layer_rows: List[np.ndarray]
    layer_cols: List[np.ndarray]
    layer_gather: List[np.ndarray]
    shapes: List[Tuple[int, int]]


def build_sample_plan(
    rows: np.ndarray,
    cols: np.ndarray,
    hw: Tuple[int, int],
    specs: Sequence[ConvSpec],
) -> SamplePlanHost:
    """Chain layer plans through the network for one sample."""
    cur_rows, cur_cols = rows.astype(np.int32), cols.astype(np.int32)
    cur_hw = hw
    out = SamplePlanHost([], [], [], [hw])
    for spec in specs:
        if spec.kernel == (1, 1) and spec.padding == (0, 0):
            gather = np.arange(cur_rows.shape[0], dtype=np.int32)[None, :]
            out.layer_rows.append(cur_rows)
            out.layer_cols.append(cur_cols)
            out.layer_gather.append(gather)
            out.shapes.append(cur_hw)
            continue
        o_rows, o_cols, gather, cur_hw = _build_layer_plan_np(
            cur_rows, cur_cols, cur_hw, spec
        )
        out.layer_rows.append(o_rows)
        out.layer_cols.append(o_cols)
        out.layer_gather.append(gather)
        out.shapes.append(cur_hw)
        cur_rows, cur_cols = o_rows, o_cols
    return out


def pad_sample_plans(
    plans: Sequence[SamplePlanHost],
    nnz0: Sequence[int],
    bucket: int = 256,
) -> List[List[LayerPlan]]:
    """Pad per-sample plans to common per-layer buckets for vmap.

    Args:
        plans: one host plan per sample.
        nnz0: true input nnz per sample (layer-0 input size before padding).
        bucket: nnz rounding granularity.

    Returns:
        plans_padded[sample][layer] as device LayerPlans; all samples share
        identical shapes per layer, so they stack/vmap.
    """
    n_layers = len(plans[0].layer_rows)
    # input of layer 0 is the original pattern; input of layer li>0 is the
    # output of layer li-1 — so in_pad is out_pad shifted by one.
    out_nnz_max = [
        max(p.layer_rows[li].shape[0] for p in plans)
        for li in range(n_layers)
    ]
    out_pad = [_round_up(m, bucket) for m in out_nnz_max]
    in_pad = [_round_up(max(nnz0), bucket)] + out_pad[:-1]

    result: List[List[LayerPlan]] = []
    for p in plans:
        sample_layers: List[LayerPlan] = []
        for li in range(n_layers):
            nnz_out = p.layer_rows[li].shape[0]
            np_out = out_pad[li]
            sentinel = in_pad[li]  # index of the appended zero row
            k = p.layer_gather[li].shape[0]
            gather = np.full((k, np_out), sentinel, np.int32)
            g = p.layer_gather[li]
            gather[:, :nnz_out] = np.where(g >= 0, g, sentinel)
            rows = np.zeros((np_out,), np.int32)
            cols = np.zeros((np_out,), np.int32)
            rows[:nnz_out] = p.layer_rows[li]
            cols[:nnz_out] = p.layer_cols[li]
            valid = np.zeros((np_out,), bool)
            valid[:nnz_out] = True
            sample_layers.append(
                LayerPlan(
                    gather=jnp.asarray(gather),
                    rows=jnp.asarray(rows),
                    cols=jnp.asarray(cols),
                    valid=jnp.asarray(valid),
                )
            )
        result.append(sample_layers)
    return result


def stack_plans(
    plans_padded: List[List[LayerPlan]],
) -> List[LayerPlan]:
    """Stack per-sample LayerPlans into batched (B, ...) LayerPlans."""
    n_layers = len(plans_padded[0])
    return [
        jax.tree.map(lambda *xs: jnp.stack(xs), *[p[li] for p in plans_padded])
        for li in range(n_layers)
    ]


def _round_up(n: int, m: int) -> int:
    return ((max(n, 1) + m - 1) // m) * m


def apply_sparse_conv(
    features: jax.Array,  # (nnz_in_pad, Cin)
    plan: LayerPlan,
    weights: jax.Array,  # (K, Cin, Cout)
    bias: jax.Array | None,  # (Cout,)
) -> jax.Array:
    """Device gather-GEMM for one layer on one sample.

    Returns (nnz_out_pad, Cout).  Bias is only added at valid sites (spconv
    adds bias per active output site; padded rows must stay zero).
    """
    feat_ext = jnp.concatenate(
        [features, jnp.zeros((1, features.shape[1]), features.dtype)], axis=0
    )
    k = weights.shape[0]
    out = jnp.zeros((plan.gather.shape[1], weights.shape[2]), features.dtype)
    for i in range(k):
        out = out + feat_ext[plan.gather[i]] @ weights[i]
    if bias is not None:
        out = out + bias[None, :]
    return jnp.where(plan.valid[:, None], out, 0)
