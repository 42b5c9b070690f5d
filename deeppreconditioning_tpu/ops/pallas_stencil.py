"""Pallas constant-coefficient 7-point Poisson stencil — the
speed-of-light SpMV for the benchmark family.

The DIA kernel (ops/pallas_spmv.py) is the general variable-coefficient
path: it must stream 7 value arrays alongside x (9 words of HBM traffic
per row).  The synthetic Poisson benchmark family (BASELINE.md: 3-D
7-point, 64^3 -> 256^3) has *constant* interior coefficients, so the
matrix needs no storage at all: y = 6x - sum of 6 neighbor shifts, with
Dirichlet boundaries as zero ghost planes.  HBM traffic drops to
2 words/row (read x, write y) — a 4.5x lower roofline bound than DIA.

Layout: x on its (nz, ny, nx) grid, host-padded to (nz+2, ny+2, nx)
with zero ghost planes in z and y; nx is the lane dimension (best as a
multiple of 128) and the x-dim boundary is handled in-kernel by
lane-rolls with edge masking.  The grid walks z-blocks; each block DMAs
its slab plus one ghost plane on each side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stencil_kernel(x_hbm, y_ref, x_scratch, sem, *, bz, ny, nx):
    """One z-slab: y = 6c - z+- - y+- - x+- neighbors."""
    i = pl.program_id(0)
    # slab rows [i*bz, i*bz + bz + 2) of the (nz+2, ny+2, nx) padded x
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * bz, bz + 2)], x_scratch, sem
    )
    dma.start()
    dma.wait()

    c = x_scratch[1:bz + 1, 1:ny + 1, :]
    acc = 6.0 * c
    acc -= x_scratch[0:bz, 1:ny + 1, :]  # z-1
    acc -= x_scratch[2:bz + 2, 1:ny + 1, :]  # z+1
    acc -= x_scratch[1:bz + 1, 0:ny, :]  # y-1
    acc -= x_scratch[1:bz + 1, 2:ny + 2, :]  # y+1

    lane = jax.lax.broadcasted_iota(jnp.int32, (bz, ny, nx), 2)
    left = pltpu.roll(c, 1, axis=2)  # brings x-1 into place
    acc -= jnp.where(lane == 0, 0.0, left)
    right = pltpu.roll(c, nx - 1, axis=2)  # -1 == nx-1: brings x+1 in
    acc -= jnp.where(lane == nx - 1, 0.0, right)

    y_ref[:, :, :] = acc


@functools.partial(jax.jit, static_argnames=("shape", "bz"))
def poisson3d_stencil_matvec(x: jax.Array, shape, bz: int = 8
                             ) -> jax.Array:
    """y = A x for the 7-point Dirichlet Poisson operator on `shape`.

    x is the flat (nz*ny*nx,) vector; returns the flat product.  Matches
    sparse.dia.poisson_dia(shape) exactly (same boundary convention).
    """
    nz, ny, nx = shape
    assert nz % bz == 0, f"nz {nz} must be divisible by bz {bz}"
    grid_x = x[: nz * ny * nx].reshape(nz, ny, nx)
    # zero ghost planes in z and y
    padded = jnp.zeros((nz + 2, ny + 2, nx), x.dtype)
    padded = padded.at[1:nz + 1, 1:ny + 1, :].set(grid_x)

    kernel = functools.partial(_stencil_kernel, bz=bz, ny=ny, nx=nx)
    y = pl.pallas_call(
        kernel,
        grid=nz // bz,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (bz, ny, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bz + 2, ny + 2, nx), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(padded)
    out = jnp.zeros_like(x)
    return out.at[: nz * ny * nx].set(y.reshape(-1))
