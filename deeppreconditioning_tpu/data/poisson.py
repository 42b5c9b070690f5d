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
    aniso: Optional[Sequence[float]] = None,
) -> DIAMatrix:
    """-div(kappa grad) on a uniform grid as DIA.

    kappa: (n,) or shape-shaped positive cell coefficients; if None,
    drawn lognormal(0, sigma) from ``rng`` (contrast ~ e^{4 sigma}).
    Face coefficient between neighboring cells = harmonic mean of the
    two cell kappas; boundary faces contribute kappa_cell to the
    diagonal (Dirichlet ghost of equal coefficient).

    aniso: optional per-axis face-coefficient multipliers — the
    discrete effect of high-aspect-ratio cells (a pressure solve on a
    stretched FVM mesh: face area / cell distance scales per axis,
    exactly how the reference's fvm::laplacian coefficients arise,
    pEqn.H:43-46).  Unlike lognormal point contrast, anisotropy is NOT
    absorbed by symmetric Jacobi scaling — the family where iteration
    counts, not setup floors, dominate solver wall-clock.
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

    aniso = (np.ones(ndim) if aniso is None
             else np.asarray(aniso, np.float64))
    for ax in range(ndim):
        lo_all = [slice(None)] * ndim
        hi_all = [slice(None)] * ndim
        lo_all[ax] = slice(0, shape[ax] - 1)
        hi_all[ax] = slice(1, shape[ax])
        face = aniso[ax] * harm(
            kappa[tuple(lo_all)], kappa[tuple(hi_all)]
        )
        diag[tuple(lo_all)] += face
        diag[tuple(hi_all)] += face
        # boundary (Dirichlet ghost with the cell's own coefficient)
        first = [slice(None)] * ndim
        last = [slice(None)] * ndim
        first[ax] = 0
        last[ax] = shape[ax] - 1
        diag[tuple(first)] += aniso[ax] * kappa[tuple(first)]
        diag[tuple(last)] += aniso[ax] * kappa[tuple(last)]
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


def poisson_rhs_sequence(
    a: DIAMatrix,
    k: int,
    rng: Optional[np.random.Generator] = None,
    step: float = 0.1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Evolving-rhs sequence over a FIXED operator (multi-RHS realism).

    The reference's real workload is time stepping: one pressure solve
    per PIMPLE corrector per time step against the SAME operator while
    the right-hand side drifts smoothly
    (foam/newInterFoam/newInterFoam.C:145-148, pEqn.H:43-49) — i.e. a
    preconditioner setup is amortized over many solves.  This emits the
    matching protocol input: x*_t random-walks with relative step
    ``step`` (x*_{t+1} = x*_t + step * noise), b_t = A x*_t.

    Returns (b_seq (k, n_pad), x_seq (k, n_pad)) float32.
    """
    rng = rng or np.random.default_rng(0)
    n, n_pad = a.n, a.n_pad
    x = np.zeros(n_pad, np.float32)
    x[:n] = rng.standard_normal(n)
    xs, bs = [], []
    for _ in range(k):
        xs.append(x.copy())
        bs.append(np.asarray(a.matvec(jnp.asarray(x))))
        nxt = x.copy()
        nxt[:n] = x[:n] + step * rng.standard_normal(n).astype(
            np.float32
        )
        x = nxt
    return np.stack(bs), np.stack(xs)


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
