"""Banded factor-form preconditioner apply — gather-free, batch-first.

The batched benchmark protocol (bench/suite.run_batched) applies the
learned preconditioner as a dense matvec ``z = M r`` with
``M = C q(B) q(B)^T C^T`` materialized at setup
(models/neural_fsai.neural_fsai_dense_preconditioner) — a handful of
n^3 MXU matmuls *per case* that dominate the technique's batched total
(VERDICT r3 weak #2: setup 141 ms vs Jacobi's whole-protocol 82 ms).
The generic factor form (ops/factor_apply.py) removes the
materialization but leans on arbitrary-index gathers, which XLA lowers
to near-serial ~130 M elem/s loads when batched over cases
(bench/suite._scaled_dense_matvec docstring).

This module exploits what the benchmark families actually look like:
FVM/mesh orderings are *banded* (the same structure RangeFSAIPlan
exploits for setup).  A lower-triangular factor C whose pattern spread
``max(row - col) + 1`` is D fits a diagonal-major band layout

    bands[d, j] = C[j + d, j],   d in [0, D), j in [0, n_pad)

and both halves of the factor apply become shift-multiply-reduce over
static offsets — pads, reshapes and one reduction; no gather, no
scatter, no dense matrix.  Batched over a case stack these run at HBM
bandwidth, so the learned technique's batched setup collapses to the
model forward plus one band-extraction contraction.

The skew trick (``_skew_right``/``_windows_up``): shifting row d of a
(D, P) array right by d positions is a pad-to-(P+D), flatten,
reshape-to-(D, P+D-1) sequence — row-major layout makes the variable
shift a single static reshape, which XLA fuses with the surrounding
elementwise work.

Reference parity: the apply equals the reference's dense
``z = (L L^T) @ r`` (uibk/deep_preconditioning/cg.py:81,
test.py:100-105) with L given in band form; the polynomial wrap mirrors
ops/factor_apply.make_fsai_poly_apply.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def band_spread(out_rows: np.ndarray, n_pad: int) -> int:
    """Max ``row - col + 1`` of an FSAI column pattern (host, numpy).

    ``out_rows`` is the (..., n_pad, w) plan row-set array (FSAIPlan /
    RangeFSAIPlan ``out_rows``, optionally case-stacked), sentinel
    ``n_pad`` on dead slots.  The dataset-global max is the static band
    count D shared by one compiled apply across all cases.
    """
    out_rows = np.asarray(out_rows)
    n = out_rows.shape[-2]
    cols = np.arange(n, dtype=out_rows.dtype)[:, None]
    offs = np.where(out_rows < n_pad, out_rows - cols, 0)
    return int(offs.max(initial=0)) + 1


def extract_bands(
    out_rows: jax.Array,  # (n_pad, w) int32, sentinel n_pad
    c_vals: jax.Array,  # (n_pad, w) column values of C
    d_max: int,
    d_isqrt: Optional[jax.Array] = None,
    n0=None,
    precision: Optional[str] = None,
) -> jax.Array:
    """Column values -> diagonal-major bands (d_max, n_pad), on device.

    Folds the dataset's symmetric Jacobi scaling
    (``C_eff = D^-1/2 C~``, rows scaled) and masks padding, mirroring
    ops/factor_apply.fsai_factor_vals — with C_eff the polynomial inner
    operator satisfies B = C_eff^T A_raw C_eff, so the poly apply needs
    only the raw-system matvec.

    The scatter c_vals[j, k] -> bands[out_rows[j,k]-j, j] is expressed
    as a one-hot contraction (exact 0/1 operand, HIGHEST precision —
    bit-exact placement).  Offsets >= d_max would be silently dropped:
    callers must take ``d_max`` from the dataset-global
    ``band_spread`` of the same patterns.
    """
    n_pad, _ = c_vals.shape
    cols = jnp.arange(n_pad, dtype=out_rows.dtype)
    safe_rows = jnp.minimum(out_rows, n_pad - 1)
    offs = out_rows - cols[:, None]
    live = out_rows < n_pad
    vals = c_vals
    if d_isqrt is not None:
        vals = vals * d_isqrt.astype(vals.dtype)[safe_rows]
    if n0 is not None:
        live = live & (safe_rows < n0) & (cols[:, None] < n0)
    vals = jnp.where(live, vals, 0.0)
    if precision == "bf16":
        # single MXU pass, bf16 inputs: the one-hot stays exact 0/1 but
        # the values round to bf16 — acceptable exactly when the bands
        # are stored bf16 anyway (the batched protocol's first attempt)
        oh = (
            offs[:, :, None] == jnp.arange(d_max, dtype=offs.dtype)
        ).astype(jnp.bfloat16)
        return jnp.einsum(
            "jk,jkd->dj", vals.astype(jnp.bfloat16), oh,
            preferred_element_type=vals.dtype,
        )
    oh = (
        offs[:, :, None] == jnp.arange(d_max, dtype=offs.dtype)
    ).astype(vals.dtype)
    return jnp.einsum(
        "jk,jkd->dj", vals, oh, precision=jax.lax.Precision.HIGHEST
    )


def banded_lower_matvec(bands: jax.Array, t: jax.Array) -> jax.Array:
    """z = C t with C lower-banded: z[i] = sum_d bands[d, i-d] t[i-d].

    bands: (..., D, n), t: (..., n); batch dims broadcast.  One padded
    buffer + D static slices + an add tree — a single XLA fusion whose
    HBM traffic is ~2x the band array (the earlier pad-flatten-reshape
    "skew" formulation materialized three copies and timed ~6x slower
    on a v5e over a 100-case batch).
    """
    n = t.shape[-1]
    d_n = bands.shape[-2]
    u = bands * t[..., None, :]
    up = jnp.pad(u, [(0, 0)] * (u.ndim - 1) + [(d_n, 0)])
    terms = [up[..., d, d_n - d:d_n - d + n] for d in range(d_n)]
    return functools.reduce(jnp.add, terms)


def banded_upper_matvec(bands: jax.Array, r: jax.Array) -> jax.Array:
    """t = C^T r: t[j] = sum_d bands[d, j] r[j + d].

    bands: (..., D, n), r: (..., n); batch dims broadcast.  D static
    overlapping slices of one padded vector, fused with the band
    multiply-accumulate.
    """
    n = r.shape[-1]
    d_n = bands.shape[-2]
    rp = jnp.pad(r, [(0, 0)] * (r.ndim - 1) + [(0, d_n)])
    terms = [
        bands[..., d, :] * rp[..., d:d + n] for d in range(d_n)
    ]
    return functools.reduce(jnp.add, terms)


def make_banded_poly_apply(matvec, degree: int):
    """Factory for the batched polynomial FSAI apply in band form:

        z = C q(B) q(B)^T C^T r,   B = C^T A C

    Suite-compatible signature ``(m_data, r) -> z`` with
    m_data = (bands (B, D, n), q_coeffs (B, degree+1), a_data) — a pure
    array pytree.  ``matvec`` (the batched raw-system matvec, e.g.
    bench/suite._scaled_dense_matvec) and ``degree`` are Python-static.
    q = I (coeffs [1, 0, ...]) reduces to plain z = C (C^T r); the
    band-form twin of ops/factor_apply.make_fsai_poly_apply.
    """

    def apply_fn(m_data, r: jax.Array) -> jax.Array:
        bands, q_coeffs, a_data = m_data
        dtype = r.dtype

        def c_t(x):  # C^T x
            return banded_upper_matvec(bands, x).astype(dtype)

        def c_(t):  # C t
            return banded_lower_matvec(bands, t).astype(dtype)

        def b_(t):  # B t = C^T A C t
            return c_t(matvec(a_data, c_(t)))

        def q_(t):  # q(B) t by Horner
            u = q_coeffs[..., degree:degree + 1].astype(dtype) * t
            for i in range(degree - 1, -1, -1):
                u = b_(u) + q_coeffs[..., i:i + 1].astype(dtype) * t
            return u

        return c_(q_(q_(c_t(r))))

    return apply_fn
