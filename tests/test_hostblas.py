"""Unit gates for the ctypes host-BLAS layer (`runtime/hostblas.py`).

The reference's host compute path made these exact calls
(cblas_dgemm/LAPACKE_dpotrf — SURVEY §1 L0); here they back the at-scale
out-of-core host path. Every op is checked in place on *sub-views* (the
leading-dimension path) against numpy/scipy oracles.
"""

import numpy as np
import pytest
import scipy.linalg

from dla_tpu.runtime import hostblas as hb

pytestmark = pytest.mark.skipif(
    not hb.available(), reason="no OpenBLAS shared library found"
)


@pytest.fixture(params=[np.float32, np.float64], ids=["f32", "f64"])
def dtype(request):
    return request.param


def _tol(dtype):
    return 1e-5 if dtype == np.float32 else 1e-12


def test_gemm_inplace_subview(dtype):
    rng = np.random.default_rng(0)
    c = np.asarray(rng.standard_normal((64, 48)), dtype)
    a = np.asarray(rng.standard_normal((32, 16)), dtype)
    b = np.asarray(rng.standard_normal((24, 16)), dtype)
    sub = c[10:42, 5:29]  # strided view, ld = 48
    ref = c.copy()
    ref[10:42, 5:29] = -1.5 * (a @ b.T) + 0.5 * sub
    hb.gemm(-1.5, a, b, 0.5, sub, transb=True)
    np.testing.assert_allclose(c, ref, rtol=_tol(dtype), atol=_tol(dtype))


def test_gemm_transa(dtype):
    rng = np.random.default_rng(1)
    a = np.asarray(rng.standard_normal((16, 32)), dtype)
    b = np.asarray(rng.standard_normal((16, 24)), dtype)
    c = np.zeros((32, 24), dtype)
    hb.gemm(1.0, a, b, 0.0, c, transa=True)
    np.testing.assert_allclose(c, a.T @ b, rtol=_tol(dtype), atol=_tol(dtype))


def test_gemm_shape_mismatch(dtype):
    with pytest.raises(ValueError, match="shape mismatch"):
        hb.gemm(1.0, np.zeros((4, 5), dtype), np.zeros((4, 5), dtype),
                0.0, np.zeros((4, 4), dtype))


def test_trsm_right_lower_trans(dtype):
    """B := B · L⁻ᵀ — the panel-solve call shape (worker_distrib.cpp:323)."""
    rng = np.random.default_rng(2)
    l = np.tril(np.asarray(rng.standard_normal((16, 16)), dtype))
    l[np.diag_indices(16)] = np.abs(l[np.diag_indices(16)]) + 4.0
    b = np.asarray(rng.standard_normal((40, 16)), dtype)
    # C = B·L⁻ᵀ  ⟺  L·Cᵀ = Bᵀ
    ref = scipy.linalg.solve_triangular(
        np.asarray(l, np.float64), np.asarray(b, np.float64).T, lower=True
    ).T
    hb.trsm(1.0, l, b, side="R", lower=True, transa=True)
    np.testing.assert_allclose(b, ref, rtol=1e-4 if dtype == np.float32 else 1e-10)


def test_syrk_lower(dtype):
    rng = np.random.default_rng(3)
    a = np.asarray(rng.standard_normal((24, 8)), dtype)
    c = np.asarray(rng.standard_normal((24, 24)), dtype)
    ref = c.copy()
    low = np.tril_indices(24)
    full = -1.0 * (a @ a.T) + ref
    ref[low] = full[low]  # syrk touches only the lower triangle
    hb.syrk(-1.0, a, 1.0, c, lower=True)
    np.testing.assert_allclose(c, ref, rtol=_tol(dtype), atol=_tol(dtype))


def test_potrf_inplace(dtype):
    rng = np.random.default_rng(4)
    m = np.asarray(rng.standard_normal((32, 32)), np.float64)
    spd = (m @ m.T + 32 * np.eye(32)).astype(dtype)
    a = spd.copy()
    assert hb.potrf(a) == 0
    ref = scipy.linalg.cholesky(np.asarray(spd, np.float64), lower=True)
    np.testing.assert_allclose(np.tril(a), ref,
                               rtol=1e-4 if dtype == np.float32 else 1e-10)


def test_potrf_reports_non_spd():
    a = np.eye(8, dtype=np.float64)
    a[5, 5] = -1.0
    assert hb.potrf(a) == 6  # 1-based pivot index, LAPACK info convention


def test_factor_panel_matches_cholesky(dtype):
    rng = np.random.default_rng(5)
    n, w, nb = 96, 48, 16
    m = np.asarray(rng.standard_normal((n, n)), np.float64)
    spd = m @ m.T + n * np.eye(n)
    ref = scipy.linalg.cholesky(spd, lower=True)
    panel = np.ascontiguousarray(spd[:, :w]).astype(dtype)
    hb.factor_panel(panel, nb)
    np.testing.assert_allclose(
        np.asarray(panel, np.float64), ref[:, :w],
        rtol=5e-4 if dtype == np.float32 else 1e-10,
        atol=5e-4 if dtype == np.float32 else 1e-10,
    )
    assert np.abs(np.triu(panel[:w], 1)).max() == 0  # tril contract


def test_factor_panel_rejects_wide():
    with pytest.raises(ValueError, match="tall"):
        hb.factor_panel(np.zeros((8, 16), np.float64), 4)


def test_ld_rejects_non_rowmajor():
    a = np.zeros((8, 8), np.float64)
    with pytest.raises(ValueError, match="row-major"):
        hb.gemm(1.0, a.T[:4, :4], a[:4, :4], 0.0, np.zeros((4, 4)))
