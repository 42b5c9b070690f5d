"""Matrix-free Poisson stencil vs DIA operator."""

import jax.numpy as jnp
import numpy as np

from deeppreconditioning_tpu.ops.pallas_stencil import (
    poisson2d_stencil_matvec,
    poisson3d_stencil_matvec,
)
from deeppreconditioning_tpu.sparse.dia import poisson_dia


def test_stencil_3d_matches_dia():
    shape = (16, 12, 128)
    a = poisson_dia(shape, dtype=jnp.float64,
                    n_pad=int(np.prod(shape)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(a.n_pad))
    y = np.asarray(poisson3d_stencil_matvec(x, shape))
    y_ref = np.asarray(a.matvec(x))
    np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-14)


def test_stencil_3d_boundaries():
    shape = (4, 4, 8)
    n = int(np.prod(shape))
    y = np.asarray(
        poisson3d_stencil_matvec(jnp.asarray(np.ones(n)), shape)
    ).reshape(shape)
    # interior of all-ones is 0; corner keeps 3 dropped neighbors
    assert abs(y[1, 1, 4]) < 1e-12
    assert abs(y[0, 0, 0] - 3.0) < 1e-12


def test_stencil_2d_matches_dia():
    shape = (24, 16)
    a = poisson_dia(shape, dtype=jnp.float64,
                    n_pad=int(np.prod(shape)))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(a.n_pad))
    y = np.asarray(poisson2d_stencil_matvec(x, shape))
    np.testing.assert_allclose(y, np.asarray(a.matvec(x)), rtol=1e-12,
                               atol=1e-14)


def test_padded_operator_cg():
    """CG on the zero-copy padded operator solves the Poisson system."""
    import jax
    from deeppreconditioning_tpu.ops.pallas_stencil import (
        StencilOperator3D,
        stencil_matvec_padded,
    )
    from deeppreconditioning_tpu.solvers.cg import conjugate_gradient

    shape = (8, 8, 8)
    n = int(np.prod(shape))
    op = StencilOperator3D(shape=shape)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)
    bp = op.embed(jnp.asarray(b))
    res = conjugate_gradient(stencil_matvec_padded, op, bp,
                             max_iter=512)
    x = np.asarray(op.extract(res.x))
    a = poisson_dia(shape, dtype=jnp.float64, n_pad=n)
    resid = np.linalg.norm(
        np.asarray(a.matvec(jnp.asarray(x))) - b
    ) / np.linalg.norm(b)
    assert resid < 1e-4
    # ghost entries stayed zero
    g = np.asarray(res.x).reshape(op.padded_shape)
    assert np.all(g[0] == 0) and np.all(g[:, 0] == 0)
