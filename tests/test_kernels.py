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


class TestPanelApply:
    """Fused Pallas panel solve (panel_apply) vs scipy and the XLA
    blocktrsm it replaces on the headline path."""

    @pytest.mark.parametrize("m,nb,ib,tb", [
        (128, 32, 16, 64),   # multi-block: correction GEMMs exercised
        (96, 32, 32, 32),    # nk=1: pure dinv apply
        (64, 16, 8, 64),     # tb > m: clamped to m
    ])
    def test_matches_scipy_solve(self, m, nb, ib, tb):
        from dla_tpu.kernels.pallas_tiles import panel_apply

        rng = np.random.default_rng(m + nb)
        lkk = np.tril(rng.standard_normal((nb, nb))) + nb * np.eye(nb)
        b = rng.standard_normal((m, nb))
        got = np.asarray(panel_apply(
            jnp.asarray(lkk, jnp.float32), jnp.asarray(b, jnp.float32),
            ib=ib, tb=tb))
        ref = scipy.linalg.solve_triangular(lkk, b.T, lower=True).T
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_matches_blocktrsm(self):
        from dla_tpu.algos.potrf import _blocktrsm_panel
        from dla_tpu.kernels.pallas_tiles import panel_apply

        rng = np.random.default_rng(7)
        m, nb, ib = 64, 32, 16
        lkk = jnp.asarray(
            np.tril(rng.standard_normal((nb, nb))) + nb * np.eye(nb),
            jnp.float32)
        b = jnp.asarray(rng.standard_normal((m, nb)), jnp.float32)
        got = np.asarray(panel_apply(lkk, b, ib=ib, tb=32))
        ref = np.asarray(_blocktrsm_panel(lkk, b, ib=ib))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_shape_and_dtype_gates(self):
        from dla_tpu.kernels.pallas_tiles import panel_apply

        lkk = jnp.eye(32, dtype=jnp.float32)
        with pytest.raises(ValueError, match="multiple of ib"):
            panel_apply(lkk, jnp.zeros((64, 32), jnp.float32), ib=24)
        with pytest.raises(ValueError, match="multiple of tb"):
            panel_apply(lkk, jnp.zeros((72, 32), jnp.float32), ib=16, tb=48)
        with pytest.raises(ValueError, match="real-only"):
            panel_apply(lkk.astype(jnp.complex64),
                        jnp.zeros((64, 32), jnp.complex64), ib=16)

    def test_inplace_pallas_panel_matches_lapack(self):
        """potrf_inplace panel='pallas' (the r3 headline path) end-to-end."""
        from dla_tpu.algos.potrf import potrf

        a = _spd(256, dtype=np.float32, seed=3)
        got = np.asarray(potrf(
            jnp.asarray(a), nb=64, mode="inplace", panel="pallas", ib=32))
        ref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(np.tril(got), ref, rtol=5e-4, atol=5e-4)

    def test_inplace_pallas_matches_blocktrsm_path(self):
        """The two panel backends agree end-to-end (auto = blocktrsm: the
        Pallas panel lost the interleaved A/B by ~1%, panel_ab.jsonl)."""
        from dla_tpu.algos.potrf import potrf

        a = _spd(192, dtype=np.float32, seed=11)
        pal = np.asarray(potrf(
            jnp.asarray(a), nb=64, mode="inplace", panel="pallas",
            ib=32, panel_ib=32))
        xla = np.asarray(potrf(
            jnp.asarray(a), nb=64, mode="inplace", panel="blocktrsm", ib=32))
        np.testing.assert_allclose(np.tril(pal), np.tril(xla),
                                   rtol=1e-5, atol=1e-5)

    def test_inplace_pallas_ineligible_raises(self):
        from dla_tpu.algos.potrf import potrf

        a = _spd(192, dtype=np.float32, seed=2)
        with pytest.raises(ValueError, match="pallas"):
            potrf(jnp.asarray(a), nb=64, mode="inplace", panel="pallas",
                  ib=32, panel_ib=48)

    def test_inplace_pallas_bf16_storage(self):
        """bf16 storage upcasts panel compute to fp32 tile-locally — the
        pallas panel is eligible (ctype fp32) and must match blocktrsm."""
        from dla_tpu.algos.potrf import potrf

        a = _spd(128, dtype=np.float32, seed=9)
        ab = jnp.asarray(a, jnp.bfloat16)
        pal = np.asarray(potrf(ab, nb=64, mode="inplace", panel="pallas",
                               ib=32, panel_ib=32)).astype(np.float32)
        xla = np.asarray(potrf(ab, nb=64, mode="inplace",
                               panel="blocktrsm", ib=32)).astype(np.float32)
        np.testing.assert_allclose(np.tril(pal), np.tril(xla),
                                   rtol=2e-2, atol=2e-2)
        ref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(np.tril(pal), ref, rtol=6e-2, atol=6e-2)
