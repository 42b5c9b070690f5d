"""Constant-stencil Poisson kernel vs DIA reference (interpret mode)."""

import functools

import jax.numpy as jnp
import numpy as np

import deeppreconditioning_tpu.ops.pallas_stencil as st
from deeppreconditioning_tpu.sparse.dia import poisson_dia


def test_stencil_matches_dia():
    shape = (16, 12, 128)
    a = poisson_dia(shape, dtype=jnp.float32,
                    n_pad=int(np.prod(shape)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(a.n_pad), jnp.float32)
    y_ref = np.asarray(a.matvec(x))

    orig = st.pl.pallas_call
    st.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        y = np.asarray(
            st.poisson3d_stencil_matvec(x, shape, bz=4)
        )
    finally:
        st.pl.pallas_call = orig
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)


def test_stencil_boundaries():
    """Corner/edge rows must drop out-of-domain neighbor terms."""
    shape = (4, 4, 128)
    n = int(np.prod(shape))
    a = poisson_dia(shape, dtype=jnp.float64, n_pad=n)
    x = jnp.asarray(np.ones(n))

    orig = st.pl.pallas_call
    st.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        y = np.asarray(
            st.poisson3d_stencil_matvec(
                jnp.asarray(np.ones(n), jnp.float32), shape, bz=2
            )
        )
    finally:
        st.pl.pallas_call = orig
    y_ref = np.asarray(a.matvec(x))
    np.testing.assert_allclose(y, y_ref, atol=1e-5)
    # interior value for all-ones input is exactly 0; corner is 3
    grid = y.reshape(shape)
    assert abs(grid[1, 1, 64]) < 1e-5
    assert abs(grid[0, 0, 0] - 3.0) < 1e-5
