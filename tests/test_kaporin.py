"""Kaporin loss: exactness at the true factor, FSAI optimality."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from deeppreconditioning_tpu.metrics import kaporin_loss
from deeppreconditioning_tpu.ops.fsai import (
    fsai_factor_scipy,
    tril_power_pattern,
)


def _spd(rng, n):
    b = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.3)
    a = b @ b.T + n * np.eye(n)
    return a


def _full_log_kaporin(a, l):
    """log K including the per-sample constant the loss drops."""
    b = l.T @ a @ l
    n = a.shape[0]
    return float(
        np.log(np.trace(b) / n) - np.linalg.slogdet(b)[1] / n
    )


def test_kaporin_zero_at_exact_factor():
    rng = np.random.default_rng(0)
    a = _spd(rng, 24)
    l = np.linalg.cholesky(np.linalg.inv(a))
    assert abs(_full_log_kaporin(a, l)) < 1e-8
    # the jax loss differs from full log K by exactly +(1/n) logdet A
    tril = jnp.asarray(np.tril(a))[None]
    loss = float(kaporin_loss(tril, jnp.asarray(l)[None]))
    n = a.shape[0]
    expected = _full_log_kaporin(a, l) + np.linalg.slogdet(a)[1] / n
    assert abs(loss - expected) < 1e-6


def test_kaporin_positive_elsewhere():
    rng = np.random.default_rng(1)
    a = _spd(rng, 16)
    l = np.linalg.cholesky(np.linalg.inv(a))
    perturbed = l + 0.05 * np.tril(rng.standard_normal(l.shape))
    assert _full_log_kaporin(a, perturbed) > 1e-4


def test_fsai_minimizes_kaporin_over_pattern():
    """The gradient of the Kaporin loss at the FSAI factor must vanish
    on the pattern (FSAI = exact pattern-constrained minimizer)."""
    nx = 5
    n = nx * nx
    main = 4.0 * np.ones(n)
    off = -1.0 * np.ones(n - 1)
    off[np.arange(1, n) % nx == 0] = 0.0
    offy = -1.0 * np.ones(n - nx)
    a_sp = sp.diags(
        [main, off, off, offy, offy], [0, -1, 1, -nx, nx]
    ).tocsr()
    a = a_sp.toarray()
    coo = sp.tril(a_sp).tocoo()
    pr, pc = tril_power_pattern(
        coo.row.astype(np.int32), coo.col.astype(np.int32), n, power=1,
    )
    c = fsai_factor_scipy(a_sp, pr, pc).toarray()

    tril = jnp.asarray(np.tril(a), jnp.float64)[None]
    grad = jax.grad(
        lambda l: kaporin_loss(tril, l[None])
    )(jnp.asarray(c, jnp.float64))
    mask = np.zeros_like(c, dtype=bool)
    mask[pr, pc] = True
    on_pattern = np.asarray(grad)[mask]
    assert np.max(np.abs(on_pattern)) < 1e-8
    # off-pattern gradient is generally nonzero (pattern binds)
    off = np.asarray(grad)[~mask & np.tri(c.shape[0], dtype=bool)]
    assert np.max(np.abs(off)) > 1e-6
