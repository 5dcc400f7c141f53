"""Pallas tile-kernel tests (interpret mode on CPU; compiled Mosaic on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from dla_tpu.kernels.pallas_tiles import (
    gemm_tile,
    panel_factor,
    potrf_tile,
    syrk_tile,
    trailing_update_lower,
    trsm_tile,
)


def _spd(n, dtype=np.float64, seed=0):
    rng = np.random.default_rng(seed)
    g = rng.standard_normal((n, n))
    return np.asarray((g + g.T) / 2 + n * np.eye(n), dtype=dtype)


class TestTileKernels:
    @pytest.mark.parametrize("n", [16, 64, 128])
    def test_potrf_tile(self, n):
        a = _spd(n, seed=n)
        l, linv = potrf_tile(jnp.asarray(a))
        ref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(np.asarray(l), ref, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(linv) @ ref, np.eye(n), atol=1e-8
        )

    def test_potrf_tile_reads_lower_only(self):
        n = 32
        a = _spd(n, seed=5)
        dirty = np.tril(a) + np.triu(np.full((n, n), 7.7), 1)
        l, _ = potrf_tile(jnp.asarray(dirty))
        ref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(np.asarray(l), ref, rtol=1e-9, atol=1e-9)

    def test_trsm_tile(self):
        n, m = 32, 64
        a = _spd(n, seed=1)
        l = scipy.linalg.cholesky(a, lower=True)
        b = np.random.default_rng(2).standard_normal((m, n))
        _, linv = potrf_tile(jnp.asarray(a))
        got = np.asarray(trsm_tile(linv, jnp.asarray(b)))
        ref = b @ np.linalg.inv(l).T
        np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-8)

    def test_syrk_tile(self):
        n = 32
        rng = np.random.default_rng(3)
        c, a = rng.standard_normal((2, n, n))
        got = np.asarray(syrk_tile(jnp.asarray(c), jnp.asarray(a)))
        full = c - a @ a.T
        np.testing.assert_allclose(np.tril(got), np.tril(full), rtol=1e-10, atol=1e-12)
        np.testing.assert_array_equal(np.triu(got, 1), np.triu(c, 1))

    def test_gemm_tile(self):
        n = 32
        rng = np.random.default_rng(4)
        c, ai, aj = rng.standard_normal((3, n, n))
        got = np.asarray(gemm_tile(jnp.asarray(c), jnp.asarray(ai), jnp.asarray(aj)))
        np.testing.assert_allclose(got, c - ai @ aj.T, rtol=1e-10, atol=1e-12)


class TestFusedPanel:
    @pytest.mark.parametrize("m,nb", [(32, 32), (128, 32), (256, 64)])
    def test_panel_factor(self, m, nb):
        """One launch == diag POTRF + all panel TRSMs."""
        a = _spd(m, seed=m + nb)
        l_full = scipy.linalg.cholesky(a, lower=True)
        # panel input: original first column panel of A (lower part)
        panel = np.tril(a)[:, :nb]
        got = np.asarray(panel_factor(jnp.asarray(panel)))
        np.testing.assert_allclose(got[:nb], np.tril(l_full[:nb, :nb]), rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(got[nb:], l_full[nb:, :nb], rtol=1e-8, atol=1e-8)

    def test_panel_rejects_ragged(self):
        with pytest.raises(ValueError):
            panel_factor(jnp.zeros((100, 32)))


class TestTrailingUpdate:
    @pytest.mark.parametrize("m,tb,nb", [(64, 32, 32), (128, 32, 16), (96, 32, 32)])
    def test_lower_pairs_only(self, m, tb, nb):
        rng = np.random.default_rng(6)
        c = rng.standard_normal((m, m))
        p = rng.standard_normal((m, nb))
        got = np.asarray(trailing_update_lower(jnp.asarray(c), jnp.asarray(p), tb=tb))
        full = c - p @ p.T
        # lower tiles (including diagonal tiles, fully) updated:
        nt = m // tb
        for i in range(nt):
            for j in range(nt):
                blk = np.s_[i * tb : (i + 1) * tb, j * tb : (j + 1) * tb]
                if i >= j:
                    np.testing.assert_allclose(got[blk], full[blk], rtol=1e-10, atol=1e-12)
                else:
                    np.testing.assert_array_equal(got[blk], c[blk])

    def test_shape_checks(self):
        with pytest.raises(ValueError):
            trailing_update_lower(jnp.zeros((64, 64)), jnp.zeros((32, 16)), tb=32)
        with pytest.raises(ValueError):
            trailing_update_lower(jnp.zeros((60, 60)), jnp.zeros((60, 16)), tb=32)


class TestPotrfPallasBackends:
    @pytest.mark.parametrize(
        "panel,trailing",
        [("pallas", "xla"), ("xla", "pallas"), ("pallas", "pallas")],
    )
    def test_matches_lapack(self, panel, trailing):
        from dla_tpu.algos import potrf_blocked

        n, nb = 128, 32
        a = _spd(n, seed=9)
        got = np.asarray(
            potrf_blocked(jnp.asarray(a), nb=nb, panel=panel, trailing=trailing)
        )
        ref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-8)

    def test_pallas_requires_divisible(self):
        from dla_tpu.algos import potrf_blocked

        with pytest.raises(ValueError):
            potrf_blocked(jnp.zeros((100, 100)), nb=32, panel="pallas")


class TestPotrfShrinkPallas:
    @pytest.mark.parametrize(
        "panel,trailing", [("pallas", "xla"), ("xla", "pallas"), ("pallas", "pallas")]
    )
    def test_matches_lapack(self, panel, trailing):
        from dla_tpu.algos import potrf_shrink

        n, nb = 128, 32
        a = _spd(n, seed=21)
        got = np.asarray(
            potrf_shrink(jnp.asarray(a), nb=nb, panel=panel, trailing=trailing)
        )
        ref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-8)

    def test_lower_only_reads_with_nan_upper(self):
        """The fully-pallas path must never read the upper triangle: seed it
        with NaNs and demand a clean factor."""
        from dla_tpu.algos import potrf_shrink

        n, nb = 128, 32
        a = _spd(n, seed=22)
        dirty = np.tril(a) + np.triu(np.full((n, n), np.nan), 1)
        got = np.asarray(
            potrf_shrink(jnp.asarray(dirty), nb=nb, panel="pallas", trailing="pallas")
        )
        ref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-8)

    def test_tb_divisor(self):
        from dla_tpu.algos import potrf_shrink

        n, nb = 128, 64
        a = _spd(n, seed=23)
        got = np.asarray(
            potrf_shrink(jnp.asarray(a), nb=nb, panel="pallas", trailing="pallas", tb=32)
        )
        ref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-8)


class TestTrailingKSplit:
    def test_ksplit_matches_full(self):
        rng = np.random.default_rng(8)
        m, tb, nb, kb = 96, 32, 64, 16  # nk = 4 k-steps
        c = rng.standard_normal((m, m))
        p = rng.standard_normal((m, nb))
        got = np.asarray(
            trailing_update_lower(jnp.asarray(c), jnp.asarray(p), tb=tb, kb=kb)
        )
        full = c - p @ p.T
        nt = m // tb
        for i in range(nt):
            for j in range(nt):
                blk = np.s_[i * tb : (i + 1) * tb, j * tb : (j + 1) * tb]
                if i >= j:
                    np.testing.assert_allclose(got[blk], full[blk], rtol=1e-10, atol=1e-12)
                else:
                    np.testing.assert_array_equal(got[blk], c[blk])

    def test_kb_must_divide(self):
        with pytest.raises(ValueError):
            trailing_update_lower(jnp.zeros((64, 64)), jnp.zeros((64, 48)), tb=32, kb=32)


class TestTrailingOrigin:
    """origin= offset form (r3): in-place update of the (origin..nt)² tile
    window of a FULL buffer — tiles outside the window pass through."""

    def test_matches_sliced_form(self):
        import numpy as np

        from dla_tpu.kernels.pallas_tiles import trailing_update_lower

        rng = np.random.default_rng(0)
        n, tb, w = 128, 16, 32
        o = 2  # origin tiles: window starts at row/col 32
        c = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
        p = jnp.asarray(rng.standard_normal((n - o * tb, w)), jnp.float32)
        full = trailing_update_lower(c, p, tb=tb, origin=o, alias=True)
        ref_win = trailing_update_lower(c[o * tb:, o * tb:], p, tb=tb, alias=True)
        np.testing.assert_allclose(
            np.tril(np.asarray(full[o * tb:, o * tb:])),
            np.tril(np.asarray(ref_win)), rtol=1e-6, atol=1e-6)
        # untouched region passes through
        np.testing.assert_array_equal(
            np.asarray(full[: o * tb]), np.asarray(c[: o * tb]))
        np.testing.assert_array_equal(
            np.asarray(full[:, : o * tb]), np.asarray(c[:, : o * tb]))

    def test_origin_requires_alias(self):
        from dla_tpu.kernels.pallas_tiles import trailing_update_lower

        c = jnp.zeros((64, 64), jnp.float32)
        p = jnp.zeros((32, 16), jnp.float32)
        import pytest as _pytest
        with _pytest.raises(ValueError, match="alias"):
            trailing_update_lower(c, p, tb=16, origin=2, alias=False)
