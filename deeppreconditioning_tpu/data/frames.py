"""Synthetic 3-D frame-structure stiffness systems (StAn-like family).

The reference's second dataset (StAnDataSet, data_set.py:141-219) holds
stiffness matrices of real frame structures from the Kaggle "StAn small
problems" release — 6 dof per node (3 translations + 3 rotations),
12x12 Euler-Bernoulli beam element couplings, spectra and sparsity
patterns qualitatively different from the FVM pressure-Poisson
M-matrices.  That download is egress-blocked here, so this module
synthesizes the same *matrix class* locally: random multi-story frame
grids of axis-aligned beam elements with randomized section properties,
assembled into the global stiffness K (SPD after grounding the base
nodes), saved in the reference's on-disk case layout (data/fvm.py
save_case) so the whole pipeline — scaling, plans, training, benchmark
— runs unchanged on the second family (VERDICT r2 next #8).

Element stiffness: standard 3-D Euler-Bernoulli beam (axial EA/L,
torsion GJ/L, bending 12EI/L^3 family), local axes rotated onto the
global frame by signed-permutation matrices (members are axis-aligned).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from deeppreconditioning_tpu.data.fvm import FVMCase


def beam_stiffness_local(
    length: float, ea: float, gj: float, eiy: float, eiz: float
) -> np.ndarray:
    """12x12 local stiffness of a 3-D Euler-Bernoulli beam along +x.

    Dof order per node: (ux, uy, uz, rx, ry, rz)."""
    le = length
    k = np.zeros((12, 12))
    # axial (ux1, ux2)
    ka = ea / le
    k[np.ix_([0, 6], [0, 6])] += ka * np.array([[1, -1], [-1, 1]])
    # torsion (rx1, rx2)
    kt = gj / le
    k[np.ix_([3, 9], [3, 9])] += kt * np.array([[1, -1], [-1, 1]])
    # bending about z (uy, rz)
    c = eiz / le**3
    kb = c * np.array([
        [12, 6 * le, -12, 6 * le],
        [6 * le, 4 * le**2, -6 * le, 2 * le**2],
        [-12, -6 * le, 12, -6 * le],
        [6 * le, 2 * le**2, -6 * le, 4 * le**2],
    ])
    k[np.ix_([1, 5, 7, 11], [1, 5, 7, 11])] += kb
    # bending about y (uz, ry) — sign convention flips the rotation rows
    c = eiy / le**3
    kb = c * np.array([
        [12, -6 * le, -12, -6 * le],
        [-6 * le, 4 * le**2, 6 * le, 2 * le**2],
        [-12, 6 * le, 12, 6 * le],
        [-6 * le, 2 * le**2, 6 * le, 4 * le**2],
    ])
    k[np.ix_([2, 4, 8, 10], [2, 4, 8, 10])] += kb
    return k


def _rotation_for_axis(axis: int) -> np.ndarray:
    """3x3 signed permutation mapping the local +x beam axis onto a
    global coordinate axis (0=x, 1=y, 2=z), right-handed."""
    if axis == 0:
        r = np.eye(3)
    elif axis == 1:
        # local x -> global y, local y -> global z, local z -> global x
        r = np.array([[0.0, 0.0, 1.0],
                      [1.0, 0.0, 0.0],
                      [0.0, 1.0, 0.0]])
    else:
        # local x -> global z
        r = np.array([[0.0, 1.0, 0.0],
                      [0.0, 0.0, 1.0],
                      [1.0, 0.0, 0.0]])
    return r


def generate_frame_case(
    rng: np.random.Generator,
    max_dof: int = 2000,
    dims: tuple | None = None,
    solve: bool = True,
) -> FVMCase:
    """Generate one frame-structure stiffness system K u = f.

    Random grid extents, randomized per-member section properties (one
    order of magnitude of spread — columns stiffer than beams), base
    nodes grounded (their dof removed), random nodal load vector, CG
    ground truth (atol 1e-6, the reference protocol,
    generate_data.py:107)."""
    if dims is not None:
        nx, ny, nz = dims
        n_nodes = nx * ny * nz
    else:
        while True:
            nx = int(rng.integers(2, 6))
            ny = int(rng.integers(2, 6))
            nz = int(rng.integers(2, 7))
            n_nodes = nx * ny * nz
            free_nodes = n_nodes - nx * ny  # base layer grounded
            if 300 <= 6 * free_nodes <= max_dof:
                break

    def nid(i, j, k):
        return (k * ny + j) * nx + i

    # member list: all axis-aligned grid edges
    members = []
    for k in range(nz):
        for j in range(ny):
            for i in range(nx):
                if i + 1 < nx:
                    members.append((nid(i, j, k), nid(i + 1, j, k), 0))
                if j + 1 < ny:
                    members.append((nid(i, j, k), nid(i, j + 1, k), 1))
                if k + 1 < nz:
                    members.append((nid(i, j, k), nid(i, j, k + 1), 2))

    e_mod = 2.1e2  # scaled steel modulus (keeps entries O(1e0..1e4))
    g_mod = e_mod / 2.6
    lengths = {0: 1.0 + 0.5 * rng.random(),
               1: 1.0 + 0.5 * rng.random(),
               2: 1.2 + 0.8 * rng.random()}

    rows, cols, vals = [], [], []
    for (na, nb, axis) in members:
        le = lengths[axis]
        # randomized section: columns (z members) one class stiffer
        scale = 3.0 if axis == 2 else 1.0
        area = scale * 10 ** rng.uniform(-0.5, 0.5)
        iy = scale * 1e-2 * 10 ** rng.uniform(-0.5, 0.5)
        iz = scale * 1e-2 * 10 ** rng.uniform(-0.5, 0.5)
        jt = 0.5 * (iy + iz)
        k_loc = beam_stiffness_local(
            le, e_mod * area, g_mod * jt, e_mod * iy, e_mod * iz
        )
        r3 = _rotation_for_axis(axis)
        t = np.zeros((12, 12))
        for blk in range(4):
            t[blk * 3:blk * 3 + 3, blk * 3:blk * 3 + 3] = r3
        k_glob = t @ k_loc @ t.T
        dofs = np.concatenate([
            6 * na + np.arange(6), 6 * nb + np.arange(6)
        ])
        rr, cc = np.meshgrid(dofs, dofs, indexing="ij")
        rows.append(rr.ravel())
        cols.append(cc.ravel())
        vals.append(k_glob.ravel())

    n_dof = 6 * n_nodes
    k_full = sp.coo_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))),
        shape=(n_dof, n_dof),
    ).tocsr()

    # ground the base layer (k = 0): remove its dof rows/cols
    free = np.ones(n_dof, bool)
    for j in range(ny):
        for i in range(nx):
            free[6 * nid(i, j, 0):6 * nid(i, j, 0) + 6] = False
    keep = np.where(free)[0]
    k_red = k_full[np.ix_(keep, keep)].tocoo()
    # tiny rotational regularization: free-end rotation dofs of a
    # single-member chain can be near-singular under roundoff
    k_red = (k_red + 1e-9 * sp.eye(k_red.shape[0])).tocoo()

    n = k_red.shape[0]
    f = rng.standard_normal(n)
    f = f / np.abs(f).max()
    if solve:
        u, info = sp.linalg.cg(
            k_red.tocsr(), f, atol=1e-6, rtol=0.0, maxiter=200000
        )
        assert info == 0, f"frame ground-truth CG diverged (info={info})"
    else:  # operator benchmarks need no ground truth
        u = np.zeros_like(f)
    return FVMCase(matrix=k_red, rhs=f, solution=u,
                   shape_2d=(nx * ny, nz))
