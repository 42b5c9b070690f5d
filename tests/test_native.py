"""Native C++ runtime vs numpy fallback parity tests."""

import numpy as np
import pytest
import scipy.sparse as sp

from deeppreconditioning_tpu import native
from deeppreconditioning_tpu.data.fvm import generate_sludge_case
from deeppreconditioning_tpu.ops.ic0 import _ic0_inplace
from deeppreconditioning_tpu.ops.sparse_conv import ConvSpec

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libdptpu.so not built"
)


def _case(seed=0):
    return generate_sludge_case(np.random.default_rng(seed), mesh_cells=2)


def test_native_conv_plan_matches_numpy():
    rng = np.random.default_rng(0)
    h = w = 40
    lin = np.sort(rng.choice(h * w, size=200, replace=False))
    rows = (lin // w).astype(np.int32)
    cols = (lin % w).astype(np.int32)
    for kernel, padding in [((2, 2), (1, 0)), ((2, 2), (0, 1)),
                            ((1, 1), (0, 0)), ((3, 3), (1, 1))]:
        kh, kw = kernel
        ph, pw = padding
        n_rows, n_cols, n_g = native.conv_plan(
            rows, cols, h, w, kh, kw, ph, pw
        )
        # numpy reference: force fallback by calling the internal impl
        # without native (recompute here)
        h_out = h + 2 * ph - kh + 1
        w_out = w + 2 * pw - kw + 1
        parts = []
        for ki in range(kh):
            for kj in range(kw):
                ro, co = rows + ph - ki, cols + pw - kj
                ok = (ro >= 0) & (ro < h_out) & (co >= 0) & (co < w_out)
                parts.append(ro[ok].astype(np.int64) * w_out + co[ok])
        exp_lin = np.unique(np.concatenate(parts))
        np.testing.assert_array_equal(
            n_rows.astype(np.int64) * w_out + n_cols, exp_lin
        )
        # spot-check gather semantics: gathered site must be the correct
        # input neighbor
        for k, (ki, kj) in enumerate(
            (a, b) for a in range(kh) for b in range(kw)
        ):
            sel = n_g[k] >= 0
            ri = n_rows[sel] - ph + ki
            ci = n_cols[sel] - pw + kj
            np.testing.assert_array_equal(rows[n_g[k][sel]], ri)
            np.testing.assert_array_equal(cols[n_g[k][sel]], ci)


def test_native_ic0_matches_numpy():
    case = _case()
    tril = sp.tril(case.matrix.tocsr(), format="csr")
    indptr = tril.indptr.astype(np.int64)
    indices = tril.indices
    d_native = tril.data.astype(np.float64).copy()
    d_numpy = tril.data.astype(np.float64).copy()
    assert native.ic0(indptr, indices, d_native) == 0
    assert _ic0_inplace(tril.shape[0], tril.indptr, indices, d_numpy)
    np.testing.assert_allclose(d_native, d_numpy, rtol=1e-12)


def test_native_levels_match_numpy():
    case = _case(seed=1)
    tril = sp.tril(case.matrix.tocsr(), format="csr")
    lv = native.levels(tril.indptr.astype(np.int64), tril.indices)
    n = tril.shape[0]
    exp = np.zeros(n, np.int32)
    for i in range(n):
        deps = tril.indices[tril.indptr[i]:tril.indptr[i + 1]]
        deps = deps[deps < i]
        if deps.size:
            exp[i] = exp[deps].max() + 1
    np.testing.assert_array_equal(lv, exp)


def test_native_ict_valid_factor():
    case = _case(seed=2)
    a = case.matrix.tocsr()
    from deeppreconditioning_tpu.ops.ic0 import ict_factor

    l = ict_factor(a, add_fill_in=2, threshold=0.01)
    # valid tril factor with positive diagonal
    assert (l.diagonal() > 0).all()
    assert sp.triu(l, k=1).nnz == 0
    # approximates A decently: kappa(M A) << kappa(A)
    linv = sp.linalg.spsolve_triangular(l.tocsr(), np.eye(a.shape[0]),
                                        lower=True)
    m = linv.T @ linv
    kappa_pre = np.linalg.cond(a.toarray())
    kappa_post = np.linalg.cond(m @ a.toarray())
    assert kappa_post < kappa_pre / 5


def test_native_ic0_speed():
    """Native IC(0) setup must be far below the Python fallback cost
    (the benchmark's setup column rides on this)."""
    import time

    case = _case(seed=3)
    tril = sp.tril(case.matrix.tocsr(), format="csr")
    indptr = tril.indptr.astype(np.int64)
    d = tril.data.astype(np.float64).copy()
    start = time.perf_counter()
    native.ic0(indptr, tril.indices, d)
    native_t = time.perf_counter() - start
    assert native_t < 0.05, f"native IC(0) took {native_t:.3f}s"


def test_native_fvm_assemble_matches_numpy():
    import deeppreconditioning_tpu.data.fvm as fvm

    rng = np.random.default_rng(3)
    ny, nx = 15, 13
    rho = np.where(rng.uniform(size=(ny, nx)) > 0.5, 1000.0, 1400.0)

    a_native, de_native = fvm.assemble_pressure_poisson(ny, nx, rho)

    # force the numpy fallback
    orig = native.available
    native.available = lambda: False
    try:
        a_numpy, de_numpy = fvm.assemble_pressure_poisson(ny, nx, rho)
    finally:
        native.available = orig

    np.testing.assert_allclose(a_native.toarray(), a_numpy.toarray(),
                               rtol=1e-14)
    np.testing.assert_allclose(de_native, de_numpy, rtol=1e-14)
