"""Packed (triangle-only) storage routines vs dense oracles (CPU fp64).

Gates: pack/unpack roundtrip exact; trtri/potri/solves match numpy to
fp64 grade; the packed solve meets the repo's 1e-10 residual contract;
complex (z) Hermitian path; packed length accounting.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dla_tpu.algos.packed import (
    col_slab,
    lauum_packed,
    pack_tri,
    packed_len,
    potri_packed,
    potrs_packed,
    solve_inverse_packed,
    trtri_packed,
    unpack_tri,
)
from dla_tpu.algos.potrf import potrf_blocked


def _spd(n, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    if np.issubdtype(dtype, np.complexfloating):
        g = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        a = (g + g.conj().T) / 2 + n * np.eye(n)
    else:
        g = rng.standard_normal((n, n))
        a = (g + g.T) / 2 + n * np.eye(n)
    return a.astype(dtype)


class TestPackedLayout:
    def test_roundtrip(self):
        n, tb = 256, 64
        a = _spd(n, 1)
        p = pack_tri(jnp.asarray(a), tb)
        assert p.shape == (packed_len(n, tb) // tb, tb)
        assert packed_len(n, tb) == n * (n + tb) // 2
        back = np.asarray(unpack_tri(p, n, tb))
        np.testing.assert_array_equal(back, np.tril(a))

    def test_col_slab_view(self):
        n, tb = 192, 64
        a = _spd(n, 2)
        p = pack_tri(jnp.asarray(a), tb)
        for j in range(n // tb):
            np.testing.assert_array_equal(
                np.asarray(col_slab(p, j, n, tb)),
                a[j * tb :, j * tb : (j + 1) * tb],
            )

    def test_rejects_bad_tb(self):
        with pytest.raises(ValueError):
            packed_len(100, 64)


class TestPackedInverse:
    def test_trtri_matches_dense_inverse(self):
        n, tb = 256, 64
        a = _spd(n, 3)
        l = np.linalg.cholesky(a)
        kp = trtri_packed(pack_tri(jnp.asarray(l), tb), n, tb)
        k = np.asarray(unpack_tri(kp, n, tb))
        np.testing.assert_allclose(k, np.linalg.inv(l), rtol=1e-9,
                                   atol=1e-11)

    def test_potri_matches_numpy_inverse(self):
        n, tb = 256, 64
        a = _spd(n, 4)
        l = np.linalg.cholesky(a)
        sp = potri_packed(pack_tri(jnp.asarray(l), tb), n, tb)
        s = np.asarray(unpack_tri(sp, n, tb))
        ref = np.linalg.inv(a)
        np.testing.assert_allclose(s, np.tril(ref), rtol=1e-8, atol=1e-10)

    def test_lauum_is_ktk(self):
        n, tb = 192, 64
        rng = np.random.default_rng(5)
        k = np.tril(rng.standard_normal((n, n)))
        sp = lauum_packed(pack_tri(jnp.asarray(k), tb), n, tb)
        s = np.asarray(unpack_tri(sp, n, tb))
        np.testing.assert_allclose(s, np.tril(k.T @ k), rtol=1e-10,
                                   atol=1e-12)


class TestPackedSolves:
    def test_solve_inverse_packed(self):
        n, tb, nrhs = 256, 64, 5
        a = _spd(n, 6)
        b = np.random.default_rng(7).standard_normal((n, nrhs))
        l = np.linalg.cholesky(a)
        sp = potri_packed(pack_tri(jnp.asarray(l), tb), n, tb)
        x = np.asarray(solve_inverse_packed(sp, jnp.asarray(b), n, tb))
        np.testing.assert_allclose(a @ x, b, rtol=1e-8, atol=1e-9)

    def test_solve_inverse_packed_vector(self):
        n, tb = 128, 64
        a = _spd(n, 8)
        b = np.random.default_rng(9).standard_normal(n)
        l = np.linalg.cholesky(a)
        sp = potri_packed(pack_tri(jnp.asarray(l), tb), n, tb)
        x = np.asarray(solve_inverse_packed(sp, jnp.asarray(b), n, tb))
        assert x.shape == (n,)
        np.testing.assert_allclose(a @ x, b, rtol=1e-8, atol=1e-9)

    def test_potrs_packed_1e10_gate(self):
        """The repo's residual contract from packed storage: factor with
        the library potrf, pack, solve — ||AX-B|| to the 1e-10 gate."""
        n, tb, nrhs = 256, 64, 3
        a = _spd(n, 10)
        b = np.random.default_rng(11).standard_normal((n, nrhs))
        l = potrf_blocked(jnp.asarray(a), nb=64)
        x = np.asarray(
            potrs_packed(pack_tri(l, tb), jnp.asarray(b), n, tb)
        )
        res = np.max(np.abs(a @ x - b)) / np.max(np.abs(b))
        assert res < 1e-10, res

    def test_potrs_packed_matches_dense_potrs(self):
        from dla_tpu.algos.solve import potrs

        n, tb = 192, 64
        a = _spd(n, 12)
        b = np.random.default_rng(13).standard_normal((n, 4))
        l = potrf_blocked(jnp.asarray(a), nb=64)
        xd = np.asarray(potrs(l, jnp.asarray(b)))
        xp = np.asarray(potrs_packed(pack_tri(l, tb), jnp.asarray(b), n, tb))
        np.testing.assert_allclose(xp, xd, rtol=1e-10, atol=1e-12)

    def test_complex_hermitian(self):
        n, tb, nrhs = 128, 64, 2
        a = _spd(n, 14, np.complex128)
        rng = np.random.default_rng(15)
        b = rng.standard_normal((n, nrhs)) + 1j * rng.standard_normal(
            (n, nrhs)
        )
        l = np.linalg.cholesky(a)
        lp = pack_tri(jnp.asarray(l), tb)
        x = np.asarray(potrs_packed(lp, jnp.asarray(b), n, tb))
        np.testing.assert_allclose(a @ x, b, rtol=1e-8, atol=1e-9)
        sp = potri_packed(lp, n, tb)
        s = np.asarray(unpack_tri(sp, n, tb))
        np.testing.assert_allclose(
            s, np.tril(np.linalg.inv(a)), rtol=1e-8, atol=1e-10
        )
        xi = np.asarray(solve_inverse_packed(sp, jnp.asarray(b), n, tb))
        np.testing.assert_allclose(a @ xi, b, rtol=1e-8, atol=1e-9)


class TestPackedPotrf:
    def test_plgsy_packed_matches_dense_generator(self):
        from dla_tpu.algos.packed import plgsy_packed
        from dla_tpu.ops.lapack_like import plgsy

        n, tb = 384, 128
        ap = plgsy_packed(n, tb, dtype=jnp.float64)
        a = np.asarray(plgsy(n, dtype=jnp.float64))
        np.testing.assert_array_equal(
            np.asarray(unpack_tri(ap, n, tb)), np.tril(a)
        )

    def test_potrf_packed_matches_cholesky(self):
        from dla_tpu.algos.packed import plgsy_packed, potrf_packed
        from dla_tpu.ops.lapack_like import plgsy

        n, tb = 384, 128
        ap = plgsy_packed(n, tb, dtype=jnp.float64)
        lp = potrf_packed(ap, n, tb)
        ref = np.linalg.cholesky(np.asarray(plgsy(n, dtype=jnp.float64)))
        np.testing.assert_allclose(
            np.asarray(unpack_tri(lp, n, tb)), ref, rtol=1e-10, atol=1e-12
        )

    def test_full_packed_pipeline_1e10(self):
        """generate → factor → invert → serve, never materializing a
        dense square; the 1e-10 solve contract holds end-to-end."""
        from dla_tpu.algos.packed import plgsy_packed, potrf_packed

        n, tb, nrhs = 256, 64, 4
        ap = plgsy_packed(n, tb, dtype=jnp.float64)
        lp = potrf_packed(ap, n, tb)
        sp = potri_packed(lp, n, tb)
        b = np.random.default_rng(21).standard_normal((n, nrhs))
        x = np.asarray(solve_inverse_packed(sp, jnp.asarray(b), n, tb))
        a = np.asarray(
            unpack_tri(plgsy_packed(n, tb, dtype=jnp.float64), n, tb)
        )
        a = a + np.tril(a, -1).T
        res = np.max(np.abs(a @ x - b)) / np.max(np.abs(b))
        assert res < 1e-10, res

    def test_potrf_packed_complex(self):
        from dla_tpu.algos.packed import potrf_packed

        n, tb = 192, 64
        a = _spd(n, 33, np.complex128)
        lp = potrf_packed(pack_tri(jnp.asarray(a), tb), n, tb)
        ref = np.linalg.cholesky(a)
        np.testing.assert_allclose(
            np.asarray(unpack_tri(lp, n, tb)), ref, rtol=1e-9, atol=1e-11
        )


class TestPackedAux:
    def test_trmm_packed(self):
        from dla_tpu.algos.packed import trmm_packed

        n, tb = 192, 64
        rng = np.random.default_rng(40)
        l = np.tril(rng.standard_normal((n, n)))
        b = rng.standard_normal((n, 3))
        lp = pack_tri(jnp.asarray(l), tb)
        np.testing.assert_allclose(
            np.asarray(trmm_packed(lp, jnp.asarray(b), n, tb)),
            l @ b, rtol=1e-10, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(trmm_packed(lp, jnp.asarray(b), n, tb, trans=True)),
            l.T @ b, rtol=1e-10, atol=1e-12,
        )

    def test_spd_matvec_streamed(self):
        from dla_tpu.algos.packed import spd_matvec_streamed
        from dla_tpu.ops.lapack_like import plgsy

        n = 2048
        a = np.asarray(plgsy(n, dtype=jnp.float64))
        x = np.random.default_rng(41).standard_normal((n, 2))
        got = np.asarray(
            spd_matvec_streamed(jnp.asarray(x, jnp.float64), n,
                                dtype=jnp.float64)
        )
        np.testing.assert_allclose(got, a @ x, rtol=1e-12, atol=1e-10)

    def test_freivalds_packed_gate(self):
        from dla_tpu.algos.packed import (
            freivalds_packed, plgsy_packed, potrf_packed,
        )

        n, tb = 512, 128
        ap = plgsy_packed(n, tb, dtype=jnp.float64)
        lp = potrf_packed(ap, n, tb)
        r = float(freivalds_packed(lp, n, tb))
        assert r < 1e-12, r
        # a corrupted factor must fail the gate
        bad = lp.at[100, 10].add(1.0)
        assert float(freivalds_packed(bad, n, tb)) > 1e-8


class TestPackedPallasTrailing:
    def test_pallas_trailing_matches_xla(self):
        from dla_tpu.algos.packed import plgsy_packed, potrf_packed

        n, tb = 768, 256
        ap = plgsy_packed(n, tb, dtype=jnp.float64)
        ref = np.asarray(
            unpack_tri(potrf_packed(ap, n, tb), n, tb)
        )
        got = np.asarray(unpack_tri(
            potrf_packed(ap, n, tb, trailing="pallas", ktb=128, kb=128),
            n, tb,
        ))
        np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-13)

    def test_pallas_trailing_bf16(self):
        from dla_tpu.algos.packed import (
            freivalds_packed, plgsy_packed, potrf_packed,
        )

        n, tb = 512, 128
        ap = plgsy_packed(n, tb, dtype=jnp.bfloat16)
        lp = potrf_packed(ap, n, tb, trailing="pallas", ktb=128)
        r = float(freivalds_packed(lp, n, tb))
        assert r < n**0.5 * 2e-4, r
