"""Uniform-strips band extraction (ops/fsai.py) vs dense oracles."""

import jax.numpy as jnp
import numpy as np

from deeppreconditioning_tpu.ops.fsai import (
    build_range_fsai_plan,
    cap_pattern_spread,
    range_dense_factor_slabs,
    range_fsai_columns,
    range_strips_uniform,
    strips_to_bands,
    tril_power_pattern,
)


def _banded_case(n=96, bw=5, seed=0):
    """Small banded SPD matrix + power-2 pattern + static-lo range plan."""
    rng = np.random.default_rng(seed)
    a = np.zeros((n, n))
    for off in range(bw + 1):
        v = rng.uniform(-1, -0.1, n - off)
        a[np.arange(off, n), np.arange(n - off)] = v
        a[np.arange(n - off), np.arange(off, n)] = v
    a[np.arange(n), np.arange(n)] = np.abs(a).sum(1) + 1.0
    d = np.sqrt(a.diagonal())
    a_scaled = a / np.outer(d, d)
    tril_r, tril_c = np.nonzero(np.tril(a_scaled))
    pr, pc = tril_power_pattern(
        tril_r.astype(np.int32), tril_c.astype(np.int32), n, power=2
    )
    plan = build_range_fsai_plan(
        pr, pc, n, width=None, range_h=None, static_lo=True
    )
    return jnp.asarray(a_scaled), plan


def test_strips_to_bands_matches_dense():
    """strips -> diagonal-major bands reproduces the dense factor's
    diagonals (including the clamped tail blocks)."""
    a_scaled, plan = _banded_case()
    c_vals = range_fsai_columns(plan, a_scaled)
    c_dense = np.asarray(range_dense_factor_slabs(plan, c_vals))
    n = plan.n_pad
    jb = plan.block_cols
    d_max = int(
        (np.asarray(plan.out_rows)
         - np.arange(n)[:, None]).max(initial=0) + 1
    )
    strips = range_strips_uniform(plan, c_vals)
    bands = np.asarray(strips_to_bands(strips, jb, d_max))
    expect = np.zeros((d_max, n))
    for off in range(d_max):
        expect[off, : n - off] = np.diagonal(c_dense, -off)
    np.testing.assert_allclose(bands, expect, rtol=1e-6, atol=1e-8)


def test_strips_to_bands_batched():
    a_scaled, plan = _banded_case(seed=1)
    c_vals = range_fsai_columns(plan, a_scaled)
    strips = range_strips_uniform(plan, c_vals)
    d_max = 16
    single = strips_to_bands(strips, plan.block_cols, d_max)
    stacked = strips_to_bands(
        jnp.broadcast_to(strips, (3,) + strips.shape),
        plan.block_cols, d_max,
    )
    np.testing.assert_allclose(
        np.asarray(stacked), np.broadcast_to(
            np.asarray(single), (3,) + single.shape
        ), rtol=0, atol=0,
    )


def test_cap_pattern_spread():
    pr = np.array([0, 5, 9, 1, 2], np.int32)
    pc = np.array([0, 0, 0, 1, 2], np.int32)
    r2, c2 = cap_pattern_spread(pr, pc, 4)
    assert list(r2) == [0, 1, 2]
    assert list(c2) == [0, 1, 2]
