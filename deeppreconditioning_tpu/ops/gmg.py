"""Geometric multigrid on structured DIA operators — zero-gather MG.

The aggregation AMG (ops/amg.py, the pyamg-class replacement for the
reference's disabled baseline, uibk/deep_preconditioning/test.py:95-98)
is mesh-agnostic but pays TPU-hostile unstructured gathers in its
transfers at scale.  On the *structured* scaling family (BASELINE.md:
uniform-grid variable-coefficient Poisson) every MG ingredient has a
gather-free form:

  * coarsening is 2x per axis with piecewise-constant aggregates, so
    restriction is a (X/2, 2, Y/2, 2, Z/2, 2) reshape-sum and
    prolongation a broadcast — pure layout ops;
  * the Galerkin coarse operator P^T A P of a 7-point DIA operator is
    again a 7-point DIA operator whose bands are reshape-sums of the
    fine bands (axis-aligned edges either stay inside an aggregate —
    feeding the coarse diagonal — or connect adjacent aggregates —
    feeding the coarse band);
  * smoothing is damped Jacobi (one DIA SpMV) or the structured FSAI
    factor S = C C^T (two more band sweeps, ops/structured_fsai.py) —
    including the TRAINED width-local NeuralFSAI head, which applies
    unchanged at every level because each coarse operator is again a
    7-point variable-coefficient stencil.

One symmetric V(1,1)-cycle is the PCG preconditioner (same symmetry
argument as ops/amg.amg_apply: symmetric smoothers, transpose-pair
transfers, symmetric dense root inverse).  At 128^3 the whole cycle
costs a handful of DIA band sweeps — the technique that converts the
random-rhs family's 248 Jacobi iterations into ~10.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from deeppreconditioning_tpu.ops.pallas_spmv import dia_matvec
from deeppreconditioning_tpu.sparse.dia import DIAMatrix


def _pad_to(n: int, mult: int = 1024) -> int:
    return ((n + mult - 1) // mult) * mult


def _axis_offsets(shape: Sequence[int]) -> Tuple[int, ...]:
    """Positive linear offsets of the 7-point stencil, x-major order
    (matching data/poisson.py's strides)."""
    nd = len(shape)
    return tuple(
        int(np.prod(shape[ax + 1:])) for ax in range(nd)
    )


@struct.dataclass
class GMGLevel:
    """One level: its DIA operator + smoother data.

    ``smoother`` bands are ``None`` for Jacobi smoothing, else the
    structured-FSAI factor in (C^T, C) DIA-view form.
    """

    a: DIAMatrix
    inv_diag: jax.Array
    c_up: Optional[DIAMatrix]
    c_low: Optional[DIAMatrix]
    shape: Tuple[int, ...] = struct.field(pytree_node=False)
    omega: float = struct.field(pytree_node=False)


@struct.dataclass
class GMGPreconditioner:
    levels: Tuple[GMGLevel, ...]
    coarse_inv: jax.Array  # (nc, nc) dense root inverse
    coarse_shape: Tuple[int, ...] = struct.field(pytree_node=False)


def _grid_view(x: jax.Array, shape) -> jax.Array:
    n = int(np.prod(shape))
    return x[:n].reshape(shape)


def galerkin_coarse_dia(a: DIAMatrix, shape) -> DIAMatrix:
    """P^T A P for piecewise-constant 2x-per-axis aggregates, DIA in,
    DIA out — pure reshape-sums, no gather.

    For an axis-aligned band value v[i] coupling cell i -> i + e_ax:
    the pair lives inside one aggregate iff i's coordinate along ax is
    even; those values sum (twice, for both triangle halves) into the
    coarse diagonal, the odd-coordinate values sum into the coarse
    band along ax.  The diagonal restricts by plain aggregate sum.
    Requires every grid dimension even (callers stop coarsening when
    one is not).
    """
    shape = tuple(int(s) for s in shape)
    nd = len(shape)
    assert all(s % 2 == 0 for s in shape)
    cshape = tuple(s // 2 for s in shape)
    nc = int(np.prod(cshape))
    n_pad_c = _pad_to(nc)
    offs = _axis_offsets(shape)
    offs_c = _axis_offsets(cshape)
    pos = {offs[ax]: ax for ax in range(nd)}

    def split(g):  # (2a, 2b, 2c) -> (a, 2, b, 2, c, 2)
        new = []
        for s in shape:
            new += [s // 2, 2]
        return g.reshape(new)

    diag_c = jnp.zeros(cshape, a.vals.dtype)
    bands_c = {}
    for d, off in enumerate(a.offsets):
        g = _grid_view(a.vals[d], shape)
        if off == 0:
            diag_c = diag_c + split(g).sum(
                axis=tuple(range(1, 2 * nd, 2))
            )
        elif off in pos:
            ax = pos[off]
            sg = split(g)
            sub = 2 * ax + 1  # the length-2 sub-axis of `ax`
            idx_even = [slice(None)] * (2 * nd)
            idx_even[sub] = 0  # even coordinate along ax
            idx_odd = [slice(None)] * (2 * nd)
            idx_odd[sub] = 1
            # integer-indexing drops axis `sub` — shift the remaining
            # sub-axis ids accordingly before reducing
            other = tuple(
                i - 1 if i > sub else i
                for i in range(1, 2 * nd, 2) if i != sub
            )
            intra = sg[tuple(idx_even)].sum(axis=other)
            inter = sg[tuple(idx_odd)].sum(axis=other)
            # intra-aggregate edges: both (i,j) and (j,i) fold into
            # the coarse diagonal
            diag_c = diag_c + 2.0 * intra
            bands_c[offs_c[ax]] = inter
        # negative offsets are the mirrors of the positive bands; the
        # symmetric coarse operator is assembled from the positive
        # halves below, so they are skipped (their contributions are
        # identical by symmetry)

    # assemble symmetric coarse DIA (offsets sorted ascending)
    n = int(np.prod(shape))
    del n
    vals = []
    offsets = []
    for ax in range(nd):
        oc = offs_c[ax]
        band = bands_c.get(
            oc, jnp.zeros(cshape, a.vals.dtype)
        ).reshape(-1)
        # vals[d, i] multiplies x[i + off]: positive band at i (valid
        # where the neighbor exists — the reshape-sum already left
        # zeros at the boundary because fine bands store 0 there)
        vals.append((oc, jnp.pad(band, (0, n_pad_c - nc))))
        # negative band: A[i, i-oc] = A[i-oc, i] = pos_band[i-oc]
        neg = jnp.pad(band, (0, n_pad_c - nc))
        neg = jnp.pad(neg[:n_pad_c - oc], (oc, 0))
        vals.append((-oc, neg))
    vals.append((0, jnp.pad(diag_c.reshape(-1), (0, n_pad_c - nc))))
    vals.sort(key=lambda t: t[0])
    return DIAMatrix(
        vals=jnp.stack([v for _, v in vals]),
        offsets=tuple(o for o, _ in vals),
        n=nc,
    )


def restrict_pc(r: jax.Array, shape) -> jax.Array:
    """P^T r: aggregate sums via reshape (fine (n_pad,) -> coarse
    (n_pad_c,))."""
    shape = tuple(int(s) for s in shape)
    nd = len(shape)
    cshape = tuple(s // 2 for s in shape)
    nc = int(np.prod(cshape))
    g = _grid_view(r, shape)
    new = []
    for s in shape:
        new += [s // 2, 2]
    rc = g.reshape(new).sum(axis=tuple(range(1, 2 * nd, 2)))
    return jnp.pad(rc.reshape(-1), (0, _pad_to(nc) - nc))


def prolong_pc(xc: jax.Array, shape) -> jax.Array:
    """P xc: broadcast each aggregate value to its 2^nd fine cells."""
    shape = tuple(int(s) for s in shape)
    nd = len(shape)
    cshape = tuple(s // 2 for s in shape)
    n = int(np.prod(shape))
    g = _grid_view(xc, cshape)
    for ax in range(nd):
        g = jnp.repeat(g, 2, axis=ax)
    return jnp.pad(g.reshape(-1), (0, _pad_to(n) - n))


def build_gmg(
    a: DIAMatrix,
    shape: Sequence[int],
    params=None,
    plan_power: int = 2,
    omega: float = 0.7,
    fsai_smoother: bool = False,
    min_side: int = 8,
    omega_fsai: float = 1.0,
) -> GMGPreconditioner:
    """Device-side GMG setup from the fine DIA operator.

    ``fsai_smoother`` replaces damped Jacobi with the structured-FSAI
    factor S = C C^T per level (classical if ``params`` is None, the
    trained NeuralFSAI head otherwise — width-local, so one checkpoint
    smooths every level).  Coarsening stops when a side would drop
    below ``min_side`` or go odd; the root is densely inverted.
    """
    from deeppreconditioning_tpu.ops.structured_fsai import (
        bands_to_dia,
        build_structured_plan,
        structured_setup,
    )

    shape = tuple(int(s) for s in shape)
    levels = []
    lvl_a, lvl_shape = a, shape
    while all(s % 2 == 0 and s >= 2 * min_side for s in lvl_shape):
        diag_idx = lvl_a.offsets.index(0)
        d = lvl_a.vals[diag_idx]
        inv_d = jnp.where(d == 0, 0.0,
                          1.0 / jnp.where(d == 0, 1.0, d))
        c_up = c_low = None
        if fsai_smoother:
            plan = build_structured_plan(lvl_shape, power=plan_power)
            bands, _ = structured_setup(lvl_a, plan, params)
            if omega_fsai != 1.0:
                bands = bands * jnp.sqrt(
                    jnp.asarray(omega_fsai, bands.dtype)
                )
            c_up, c_low = bands_to_dia(bands, plan.offsets, lvl_a.n)
        levels.append(GMGLevel(
            a=lvl_a, inv_diag=inv_d, c_up=c_up, c_low=c_low,
            shape=lvl_shape, omega=omega,
        ))
        lvl_a = galerkin_coarse_dia(lvl_a, lvl_shape)
        lvl_shape = tuple(s // 2 for s in lvl_shape)

    # dense root inverse (host, f64, symmetrized)
    nc = lvl_a.n
    dense = np.zeros((nc, nc))
    vals = np.asarray(lvl_a.vals, np.float64)
    for d_i, off in enumerate(lvl_a.offsets):
        i0, i1 = max(0, -off), min(nc, nc - off)
        idx = np.arange(i0, i1)
        dense[idx, idx + off] = vals[d_i, i0:i1]
    inv = np.linalg.inv(dense)
    return GMGPreconditioner(
        levels=tuple(levels),
        coarse_inv=jnp.asarray(0.5 * (inv + inv.T), a.vals.dtype),
        coarse_shape=lvl_shape,
    )


def _smooth(lev: GMGLevel, r: jax.Array) -> jax.Array:
    if lev.c_up is None:
        return lev.omega * lev.inv_diag * r
    return dia_matvec(lev.c_low, dia_matvec(lev.c_up, r))


def gmg_apply(m: GMGPreconditioner, r: jax.Array) -> jax.Array:
    """One symmetric V(1,1)-cycle: z ~= A^-1 r (PCG apply).

    Unrolled at trace time over the static level tuple; every operator
    application is a DIA band sweep, every transfer a reshape.
    """

    def cycle(lvl: int, r: jax.Array) -> jax.Array:
        if lvl == len(m.levels):
            nc = m.coarse_inv.shape[0]
            z = m.coarse_inv @ r[:nc]
            return jnp.pad(z, (0, r.shape[0] - nc))
        lev = m.levels[lvl]
        x = _smooth(lev, r)
        res = r - dia_matvec(lev.a, x)
        xc = cycle(lvl + 1, restrict_pc(res, lev.shape))
        x = x + prolong_pc(xc, lev.shape)
        return x + _smooth(lev, r - dia_matvec(lev.a, x))

    return cycle(0, r)
