"""Variable-coefficient Poisson operators on uniform grids, DIA-native.

The BASELINE.md scaling family (7-point Poisson ladders) plus a random
coefficient-field variant for *training* the learned preconditioner at
scale: -div(kappa grad u) with cell-wise lognormal kappa, harmonic-mean
face coefficients (the FVM discretization the sludge generator uses,
data/fvm.py), Dirichlet boundaries — SPD, diagonally dominant,
7-point/5-point structured.  Assembled directly into the DIA layout
(sparse/dia.py), the scaling-path operator format; ``to_scipy`` gives
the host oracle for tests.

Reference parity: same matrix class as the reference's pressure systems
(pEqn.H:43-96 — harmonic-coefficient Laplacian with BC-folded diagonal)
on a uniform box instead of a castellated mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from deeppreconditioning_tpu.sparse.dia import DIAMatrix


def poisson_coeff_dia(
    shape: Sequence[int],
    kappa: Optional[np.ndarray] = None,
    rng: Optional[np.random.Generator] = None,
    sigma: float = 1.0,
    dtype=jnp.float32,
    n_pad: Optional[int] = None,
) -> DIAMatrix:
    """-div(kappa grad) on a uniform grid as DIA.

    kappa: (n,) or shape-shaped positive cell coefficients; if None,
    drawn lognormal(0, sigma) from ``rng`` (contrast ~ e^{4 sigma}).
    Face coefficient between neighboring cells = harmonic mean of the
    two cell kappas; boundary faces contribute kappa_cell to the
    diagonal (Dirichlet ghost of equal coefficient).
    """
    shape = tuple(int(s) for s in shape)
    ndim = len(shape)
    n = int(np.prod(shape))
    if n_pad is None:
        n_pad = ((n + 1023) // 1024) * 1024
    if kappa is None:
        rng = rng or np.random.default_rng(0)
        kappa = np.exp(sigma * rng.standard_normal(n))
    kappa = np.asarray(kappa, np.float64).reshape(shape)

    strides = [int(np.prod(shape[i + 1:])) for i in range(ndim)]
    offsets = sorted({0} | {s for s in strides} | {-s for s in strides})
    vals = np.zeros((len(offsets), n_pad), np.float64)
    diag = np.zeros(shape, np.float64)

    def harm(a, b):
        return 2.0 * a * b / (a + b)

    for ax in range(ndim):
        lo_all = [slice(None)] * ndim
        hi_all = [slice(None)] * ndim
        lo_all[ax] = slice(0, shape[ax] - 1)
        hi_all[ax] = slice(1, shape[ax])
        face = harm(kappa[tuple(lo_all)], kappa[tuple(hi_all)])
        diag[tuple(lo_all)] += face
        diag[tuple(hi_all)] += face
        # boundary (Dirichlet ghost with the cell's own coefficient)
        first = [slice(None)] * ndim
        last = [slice(None)] * ndim
        first[ax] = 0
        last[ax] = shape[ax] - 1
        diag[tuple(first)] += kappa[tuple(first)]
        diag[tuple(last)] += kappa[tuple(last)]
        # off-diagonals: vals[d, i] multiplies x[i + off]
        pos = offsets.index(strides[ax])
        neg = offsets.index(-strides[ax])
        facef = np.zeros(shape, np.float64)
        facef[tuple(lo_all)] = face  # face between i and i+stride
        vals[pos, :n] += -facef.reshape(-1)
        faceb = np.zeros(shape, np.float64)
        faceb[tuple(hi_all)] = face
        # += (not =): axes with colliding linear strides (any size-1
        # grid dim, e.g. (n, 1)) share a DIA band — assignment would
        # silently zero the earlier axis' couplings (ADVICE r4 #3)
        vals[neg, :n] += -faceb.reshape(-1)

    vals[offsets.index(0), :n] = diag.reshape(-1)
    return DIAMatrix(
        vals=jnp.asarray(vals, dtype), offsets=tuple(offsets), n=n
    )


def poisson_family(
    count: int,
    shape: Sequence[int],
    seed: int = 0,
    sigma: float = 1.0,
    dtype=jnp.float32,
) -> Tuple[list, list]:
    """A seeded family of coefficient-field operators + random rhs
    (b = A x*, x* standard normal — known solution)."""
    rng = np.random.default_rng(seed)
    mats, rhss = [], []
    for _ in range(count):
        a = poisson_coeff_dia(shape, rng=rng, sigma=sigma, dtype=dtype)
        x_star = rng.standard_normal(a.n_pad)
        x_star[a.n:] = 0.0
        b = np.asarray(a.matvec(jnp.asarray(x_star, a.vals.dtype)))
        mats.append(a)
        rhss.append(b)
    return mats, rhss
