"""Pallas BSR SpMV/SpMM — scalar-prefetched block-sparse matmul.

The MXU kernel for unstructured sparse operators (sparse/bsr.py): grid
walks (block_row, slot); the block-column index list is scalar-
prefetched so each x block is steered into VMEM by the BlockSpec
index_map *before* the kernel body runs — the canonical TPU block-
sparse pattern (PrefetchScalarGridSpec).  The output block accumulates
across the slot dimension in place.

SpMM (multiple right-hand sides) uses the same kernel with x of shape
(n_pad, m): every matmul is (bs x bs) @ (bs x m) — MXU-shaped when
bs, m >= 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deeppreconditioning_tpu.sparse.bsr import BSRMatrix


def _bsr_kernel(cols_ref, block_ref, x_ref, y_ref):
    """grid = (R, S): y[i] (+)= blocks[i, j] @ x[cols[i, j]]."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    y_ref[...] += jnp.dot(
        block_ref[...], x_ref[...],
        preferred_element_type=y_ref.dtype,
    )


@functools.partial(jax.jit, static_argnames=())
def bsr_matmat_pallas(a: BSRMatrix, x: jax.Array) -> jax.Array:
    """Y = A @ X for X of shape (n_pad, m); the block-column list rides
    in scalar-prefetch memory and steers the X block DMAs."""
    bs = a.block_size
    r, s = a.n_block_rows, a.slots
    m = x.shape[1]
    # pad X with one zero block-row for the sentinel id r
    x_ext = jnp.concatenate(
        [x, jnp.zeros((bs, m), x.dtype)], axis=0
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r, s),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bs, bs),
                lambda i, j, cols: (i, j, 0, 0),
            ),
            pl.BlockSpec(
                (bs, m),
                lambda i, j, cols: (cols[i, j], 0),
            ),
        ],
        out_specs=pl.BlockSpec((bs, m), lambda i, j, cols: (i, 0)),
    )

    def kernel(cols_ref, block_ref, x_ref, y_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        y_ref[...] += jnp.dot(
            block_ref[0, 0], x_ref[...],
            preferred_element_type=y_ref.dtype,
        )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r * bs, m), x.dtype),
    )(a.block_cols, a.blocks, x_ext)


def bsr_matvec_pallas(a: BSRMatrix, x: jax.Array,
                      lanes: int = 128) -> jax.Array:
    """y = A @ x via the SpMM kernel with x broadcast to `lanes` columns
    (a bs x 1 matmul wastes the MXU; lane-replicating x keeps the unit
    cost identical while the kernel stays one code path)."""
    xm = jnp.broadcast_to(x[:, None], (x.shape[0], lanes))
    y = bsr_matmat_pallas(a, xm)
    return y[:, 0]
