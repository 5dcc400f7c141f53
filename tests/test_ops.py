import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from dla_tpu.ops import (
    geadd,
    gemm,
    lacpy,
    lange,
    lauum,
    plgsy,
    plgsy_tile,
    potrf_unblocked,
    spd_gershgorin,
    syrk,
    trsm,
    trtri_lower,
)


def _spd(n, dtype=np.float64, seed=0):
    rng = np.random.default_rng(seed)
    g = rng.standard_normal((n, n))
    return np.asarray((g + g.T) / 2 + n * np.eye(n), dtype=dtype)


class TestPlgsy:
    def test_symmetric(self):
        a = np.asarray(plgsy(64, seed=7))
        np.testing.assert_allclose(a, a.T, rtol=0, atol=0)

    def test_spd_with_default_bump(self):
        a = np.asarray(plgsy(96, seed=3), dtype=np.float64)
        w = np.linalg.eigvalsh(a)
        assert w.min() > 0

    def test_tile_consistency(self):
        """Any tile generated locally must match the same region of the full
        matrix — the property the distributed path depends on."""
        n, nb = 96, 32
        full = np.asarray(plgsy(n, bump=float(n), seed=11))
        for i0 in range(0, n, nb):
            for j0 in range(0, n, nb):
                t = np.asarray(
                    plgsy_tile(11, i0, j0, nb, nb, bump=float(n))
                )
                np.testing.assert_array_equal(t, full[i0 : i0 + nb, j0 : j0 + nb])

    def test_seed_changes_matrix(self):
        a = np.asarray(plgsy(32, seed=1))
        b = np.asarray(plgsy(32, seed=2))
        assert not np.array_equal(a, b)

    def test_values_bounded(self):
        a = np.asarray(plgsy(64, bump=0.0, seed=5))
        assert np.all(np.abs(a) <= 0.5)

    def test_gershgorin_spd(self):
        a = np.asarray(spd_gershgorin(80, seed=12345), dtype=np.float64)
        np.testing.assert_allclose(a, a.T)
        w = np.linalg.eigvalsh(a)
        assert w.min() > 0


class TestNorms:
    @pytest.mark.parametrize("norm", ["M", "1", "I", "F"])
    def test_lange_vs_numpy(self, norm):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((17, 23))
        got = float(lange(norm, jnp.asarray(a)))
        ref = {
            "M": np.max(np.abs(a)),
            "1": np.linalg.norm(a, 1),
            "I": np.linalg.norm(a, np.inf),
            "F": np.linalg.norm(a, "fro"),
        }[norm]
        np.testing.assert_allclose(got, ref, rtol=1e-12)


class TestLapackLike:
    def test_lacpy(self):
        a = jnp.arange(16.0).reshape(4, 4)
        np.testing.assert_array_equal(np.asarray(lacpy("L", a)), np.tril(a))
        np.testing.assert_array_equal(np.asarray(lacpy("U", a)), np.triu(a))
        np.testing.assert_array_equal(np.asarray(lacpy("A", a)), np.asarray(a))

    def test_lauum_lower(self):
        rng = np.random.default_rng(1)
        l = np.tril(rng.standard_normal((8, 8)))
        got = np.asarray(lauum("L", jnp.asarray(l)))
        np.testing.assert_allclose(got, l.T @ l, rtol=1e-12)

    def test_geadd(self):
        rng = np.random.default_rng(2)
        a, b = rng.standard_normal((2, 5, 5))
        got = np.asarray(geadd(-1.0, jnp.asarray(a), 1.0, jnp.asarray(b)))
        np.testing.assert_allclose(got, b - a, rtol=1e-12)
        got_t = np.asarray(geadd(2.0, jnp.asarray(a), 0.5, jnp.asarray(b), trans=True))
        np.testing.assert_allclose(got_t, 2 * a.T + 0.5 * b, rtol=1e-12)


class TestBlas3:
    def test_gemm_reference_shape(self):
        """The trailing-update GEMM: C ← -A_i·A_j^T + C
        (worker_distrib.cpp:511)."""
        rng = np.random.default_rng(3)
        ai, aj, c = rng.standard_normal((3, 32, 32))
        got = np.asarray(
            gemm(-1.0, jnp.asarray(ai), jnp.asarray(aj), 1.0, jnp.asarray(c), transb=True)
        )
        np.testing.assert_allclose(got, c - ai @ aj.T, rtol=1e-10, atol=1e-12)

    def test_gemm_complex_3m_matches_direct(self, monkeypatch):
        """The 3-real-GEMM Karatsuba path for complex A·Bᵀ/ᴴ (r5 c64
        trailing lever) must match the direct complex product at fp64
        grade, for both conjb settings, and respect DLA_TPU_C3M=0."""
        rng = np.random.default_rng(6)
        a = rng.standard_normal((24, 16)) + 1j * rng.standard_normal((24, 16))
        b = rng.standard_normal((24, 16)) + 1j * rng.standard_normal((24, 16))
        c = rng.standard_normal((24, 24)) + 1j * rng.standard_normal((24, 24))
        ja, jb_, jc = map(jnp.asarray, (a, b, c))
        for conjb, ref in [
            (True, c - a @ b.conj().T),
            (False, c - a @ b.T),
        ]:
            monkeypatch.setenv("DLA_TPU_C3M", "1")
            got = np.asarray(gemm(-1.0, ja, jb_, 1.0, jc,
                                  transb=True, conjb=conjb))
            np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)
            monkeypatch.setenv("DLA_TPU_C3M", "0")
            direct = np.asarray(gemm(-1.0, ja, jb_, 1.0, jc,
                                     transb=True, conjb=conjb))
            np.testing.assert_allclose(direct, ref, rtol=1e-10, atol=1e-12)

    def test_syrk_lower(self):
        """The diagonal trailing update: C ← -A·A^T + C on the lower triangle
        (worker_distrib.cpp:416)."""
        rng = np.random.default_rng(4)
        a, c = rng.standard_normal((2, 16, 16))
        got = np.asarray(syrk(-1.0, jnp.asarray(a), 1.0, jnp.asarray(c)))
        full = c - a @ a.T
        np.testing.assert_allclose(np.tril(got), np.tril(full), rtol=1e-12)
        np.testing.assert_allclose(np.triu(got, 1), np.triu(c, 1), rtol=0, atol=0)

    def test_trsm_right_lower_trans(self):
        """The panel solve: B ← B·inv(L)^T (worker_distrib.cpp:323)."""
        rng = np.random.default_rng(5)
        l = np.tril(rng.standard_normal((12, 12))) + 12 * np.eye(12)
        b = rng.standard_normal((20, 12))
        got = np.asarray(trsm(1.0, jnp.asarray(l), jnp.asarray(b)))
        np.testing.assert_allclose(got, b @ np.linalg.inv(l).T, rtol=1e-9)

    def test_trsm_left(self):
        rng = np.random.default_rng(6)
        l = np.tril(rng.standard_normal((12, 12))) + 12 * np.eye(12)
        b = rng.standard_normal((12, 7))
        got = np.asarray(trsm(1.0, jnp.asarray(l), jnp.asarray(b), side="L", transa=False))
        np.testing.assert_allclose(got, np.linalg.solve(l, b), rtol=1e-9)


class TestUnblocked:
    @pytest.mark.parametrize("n", [1, 4, 33, 128])
    def test_potrf_unblocked_vs_lapack(self, n):
        a = _spd(n, seed=n)
        got = np.asarray(potrf_unblocked(jnp.asarray(a)))
        ref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-10)
        assert np.all(np.triu(got, 1) == 0)

    @pytest.mark.parametrize("n", [1, 8, 64])
    def test_trtri_lower(self, n):
        a = _spd(n, seed=100 + n)
        l = scipy.linalg.cholesky(a, lower=True)
        got = np.asarray(trtri_lower(jnp.asarray(l)))
        np.testing.assert_allclose(got @ l, np.eye(n), atol=1e-9)
