import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from dla_tpu import plgsy, potrf, residual_potrf
from dla_tpu.algos import posv, posv_refined, potrf_blocked, potrf_masked, potrs
from dla_tpu.validate import PASS_THRESHOLD, cholesky_invariants


def _spd(n, dtype=np.float64, seed=0):
    rng = np.random.default_rng(seed)
    g = rng.standard_normal((n, n))
    return np.asarray((g + g.T) / 2 + n * np.eye(n), dtype=dtype)


class TestPotrfBlocked:
    @pytest.mark.parametrize("n,nb", [(64, 16), (128, 32), (256, 64), (100, 32), (37, 16)])
    def test_vs_lapack(self, n, nb):
        a = _spd(n, seed=n + nb)
        got = np.asarray(potrf_blocked(jnp.asarray(a), nb=nb))
        ref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)

    def test_residual_gate_fp64(self):
        """The reference's own 1e-10 PASS gate (v6_test.c:87) — which its
        recorded runs never met (SURVEY §4.1) — must actually pass here,
        on the reference's own generator (dplgsy-style, bump=N, seeded)."""
        n = 512
        a = plgsy(n, seed=51, dtype=jnp.float64)
        l = potrf_blocked(a, nb=128)
        res = float(residual_potrf(a, l))
        assert res < PASS_THRESHOLD, res

    def test_diag_factor_unblocked(self):
        n = 128
        a = _spd(n, seed=9)
        got = np.asarray(potrf_blocked(jnp.asarray(a), nb=32, diag_factor="unblocked"))
        ref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)

    def test_update_cols_granularity(self):
        n = 256
        a = _spd(n, seed=10)
        ref = scipy.linalg.cholesky(a, lower=True)
        for uc in (64, 128, 256):
            got = np.asarray(potrf_blocked(jnp.asarray(a), nb=64, update_cols=uc))
            np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)

    def test_lower_only_input(self):
        """Only the lower triangle of A may be read (the reference's
        validation bug came from violating this — SURVEY Appendix A)."""
        n = 96
        a = _spd(n, seed=11)
        garbage = np.triu(np.full((n, n), np.nan), 1)
        a_dirty = np.tril(a) + garbage
        got = np.asarray(potrf_blocked(jnp.asarray(a_dirty), nb=32))
        ref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)

    def test_invariants(self):
        a = plgsy(128, seed=4, dtype=jnp.float64)
        l = potrf_blocked(a, nb=32)
        inv = cholesky_invariants(l)
        assert int(inv.nan_count) == 0
        assert int(inv.inf_count) == 0
        assert float(inv.diag_min) > 0
        assert float(inv.upper_maxabs) == 0.0


class TestPotrfMasked:
    @pytest.mark.parametrize("n,nb", [(64, 16), (128, 32), (128, 128)])
    def test_vs_lapack(self, n, nb):
        a = _spd(n, seed=n)
        got = np.asarray(potrf_masked(jnp.asarray(a), nb=nb))
        ref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)

    def test_non_multiple_via_potrf_wrapper(self):
        a = _spd(100, seed=13)
        got = np.asarray(potrf(jnp.asarray(a), nb=32, mode="masked"))
        ref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)

    def test_matches_blocked(self):
        a = _spd(192, seed=14)
        lm = np.asarray(potrf_masked(jnp.asarray(a), nb=64))
        lb = np.asarray(potrf_blocked(jnp.asarray(a), nb=64))
        np.testing.assert_allclose(lm, lb, rtol=1e-12, atol=1e-12)


class TestSolve:
    def test_potrs(self):
        n = 128
        a = _spd(n, seed=20)
        b = np.random.default_rng(21).standard_normal((n, 4))
        l, x = posv(jnp.asarray(a), jnp.asarray(b), nb=32)
        np.testing.assert_allclose(a @ np.asarray(x), b, rtol=1e-8, atol=1e-8)

    def test_potrs_vector(self):
        n = 64
        a = _spd(n, seed=22)
        b = np.random.default_rng(23).standard_normal(n)
        l = potrf_blocked(jnp.asarray(a), nb=32)
        x = np.asarray(potrs(l, jnp.asarray(b)))
        np.testing.assert_allclose(a @ x, b, rtol=1e-8, atol=1e-8)

    def test_potrs_blocked_ib_values_agree(self):
        """The serving knob: every ib yields the same solution through the
        blocked (n >= 2048 auto) path, forced here on a small n."""
        n = 384
        a = _spd(n, seed=24)
        b = np.random.default_rng(25).standard_normal((n, 8))
        l = potrf_blocked(jnp.asarray(a), nb=64)
        for ib in (64, 128, 384, 512):
            x = np.asarray(potrs(l, jnp.asarray(b), blocked=True, ib=ib))
            np.testing.assert_allclose(a @ x, b, rtol=1e-8, atol=1e-8)

    def test_solve_inverse_serving_path(self):
        """potri (blocked) + solve_inverse == potrs to the fp64 gate on a
        well-conditioned SPD matrix (forward error ~kappa*eps)."""
        from dla_tpu.algos import potri, solve_inverse

        n = 320
        a = _spd(n, seed=26)
        b = np.random.default_rng(27).standard_normal((n, 8))
        l = potrf_blocked(jnp.asarray(a), nb=64)
        ainv = potri(l, blocked=True, ib=64)
        x = np.asarray(solve_inverse(ainv, jnp.asarray(b)))
        np.testing.assert_allclose(a @ x, b, rtol=1e-8, atol=1e-8)
        # and the two potri routes agree
        ainv_native = np.asarray(potri(l, blocked=False))
        np.testing.assert_allclose(
            np.asarray(ainv), ainv_native, rtol=1e-8, atol=1e-10
        )

    def test_mixed_precision_refinement_hits_fp64_grade(self):
        """fp32 factor + fp64 refinement must reach ≤1e-10 solve residual
        (north star, BASELINE.json config 3)."""
        n = 256
        a = jnp.asarray(_spd(n, seed=30))
        b = jnp.asarray(np.random.default_rng(31).standard_normal((n, 2)))
        l, x, _ = posv_refined(a, b, nb=64, factor_dtype=jnp.float32, iters=6)
        from dla_tpu.validate import residual_posv

        res = float(residual_posv(a, b, x))
        assert res < 1e-10, res
        assert l.dtype == jnp.float32
        assert x.dtype == jnp.float64


class TestPotrfShrink:
    import pytest as _pytest

    @_pytest.mark.parametrize("n,nb", [(64, 16), (128, 32), (100, 32), (37, 16)])
    def test_vs_lapack(self, n, nb):
        import numpy as np
        import jax.numpy as jnp
        import scipy.linalg
        from dla_tpu.algos import potrf_shrink

        a = _spd(n, seed=n + 3 * nb)
        got = np.asarray(potrf_shrink(jnp.asarray(a), nb=nb))
        ref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)

    def test_matches_blocked(self):
        import numpy as np
        import jax.numpy as jnp
        from dla_tpu.algos import potrf_blocked, potrf_shrink

        a = _spd(192, seed=15)
        ls = np.asarray(potrf_shrink(jnp.asarray(a), nb=64))
        lb = np.asarray(potrf_blocked(jnp.asarray(a), nb=64))
        np.testing.assert_allclose(ls, lb, rtol=1e-11, atol=1e-11)


class TestEdgeCases:
    @pytest.mark.parametrize("n,nb", [(1, 1), (1, 64), (16, 64), (64, 64), (65, 64)])
    def test_small_and_single_tile(self, n, nb):
        rng = np.random.default_rng(n * 7 + nb)
        g = rng.standard_normal((n, n))
        a = (g + g.T) / 2 + (n + 2) * np.eye(n)  # +2: PD even at n=1
        got = np.asarray(potrf_blocked(jnp.asarray(a), nb=nb))
        ref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
    def test_seed_sweep_invariants(self, seed):
        """Property sweep: every factor satisfies the worker-v2 invariants
        and the residual gate (SURVEY §4.4)."""
        n = 96 + 16 * (seed % 3)
        a = jnp.asarray(_spd(n, seed=seed))
        l = potrf_blocked(a, nb=32)
        inv = cholesky_invariants(l)
        assert int(inv.nan_count) == 0 and int(inv.inf_count) == 0
        assert float(inv.diag_min) > 0
        assert float(inv.upper_maxabs) == 0.0
        assert float(residual_potrf(a, l)) < PASS_THRESHOLD

    def test_fp32_residual_scales_with_n(self):
        for n in (128, 512):
            a = plgsy(n, seed=51, dtype=jnp.float32)
            l = potrf_blocked(a, nb=64)
            res = float(residual_potrf(a, l))
            assert res < n * 2e-7, (n, res)


class TestPotriBatched:
    def test_potri_matches_inverse(self):
        from dla_tpu.algos.potri import potri

        n = 96
        a = _spd(n, seed=60)
        l = potrf_blocked(jnp.asarray(a), nb=32)
        got = np.asarray(potri(l))
        ref = np.linalg.inv(a)
        np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-10)

    def test_potrs_batched(self):
        from dla_tpu.algos import potrs_batched
        from dla_tpu.algos.potri import potrf_batched

        rng = np.random.default_rng(62)
        batch, n, nrhs = 4, 64, 3
        gs = rng.standard_normal((batch, n, n))
        a = (gs + gs.transpose(0, 2, 1)) / 2 + n * np.eye(n)
        b = rng.standard_normal((batch, n, nrhs))
        ls = potrf_batched(jnp.asarray(a), nb=16)
        xs = np.asarray(potrs_batched(ls, jnp.asarray(b)))
        for i in range(batch):
            np.testing.assert_allclose(a[i] @ xs[i], b[i],
                                       rtol=1e-8, atol=1e-8)

    def test_potrf_batched(self):
        from dla_tpu.algos.potri import potrf_batched

        rng = np.random.default_rng(61)
        batch, n = 5, 48
        gs = rng.standard_normal((batch, n, n))
        a = (gs + gs.transpose(0, 2, 1)) / 2 + n * np.eye(n)
        ls = np.asarray(potrf_batched(jnp.asarray(a), nb=16))
        for i in range(batch):
            ref = scipy.linalg.cholesky(a[i], lower=True)
            np.testing.assert_allclose(ls[i], ref, rtol=1e-9, atol=1e-9)


class TestPanelInvGemm:
    def test_invgemm_matches_lapack(self):
        from dla_tpu.algos import potrf_shrink

        n, nb = 192, 64
        a = _spd(n, seed=70)
        got = np.asarray(potrf_shrink(jnp.asarray(a), nb=nb, panel="invgemm"))
        ref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-8)

    def test_blocktrsm_matches_lapack(self):
        """Blocked-TRSM panel (only ib-diagonal blocks inverted; the rest
        MXU GEMMs — the round-2 TPU panel path)."""
        from dla_tpu.algos import potrf_shrink

        n, nb = 256, 64
        a = _spd(n, seed=71)
        got = np.asarray(potrf_shrink(jnp.asarray(a), nb=nb, panel="blocktrsm"))
        ref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-8)

    def test_blocktrsm_inner_blocking_nondivisible_width(self):
        """nb larger than the default inner block and nb < inner block both
        reduce correctly (ib is clamped to the panel width)."""
        from dla_tpu.algos.potrf import _blocktrsm_panel

        rng = np.random.default_rng(5)
        for w, ib in [(96, 32), (32, 512)]:
            g = rng.standard_normal((w, w))
            lkk = np.tril(g + w * np.eye(w))
            b = rng.standard_normal((64, w))
            got = np.asarray(
                _blocktrsm_panel(jnp.asarray(lkk), jnp.asarray(b), ib=ib)
            )
            ref = scipy.linalg.solve_triangular(lkk, b.T, lower=True).T
            np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)


class TestPrecisionOverride:
    def test_precision_static_arg_retraces(self):
        """Same shapes at two precisions must give two traces (the env var
        alone cannot retrigger a jit trace) — and both factor correctly."""
        from dla_tpu.algos import potrf_shrink

        n, nb = 128, 32
        a = _spd(n, seed=72).astype(np.float32)
        ref = scipy.linalg.cholesky(a.astype(np.float64), lower=True)
        for prec in ("default", "high", "highest"):
            got = np.asarray(potrf_shrink(jnp.asarray(a), nb=nb, precision=prec))
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_override_restored_on_error(self):
        from dla_tpu.utils import precision as P

        with pytest.raises(ValueError):
            with P.override("nonsense"):
                pass
        try:
            with P.override("default"):
                assert P.matmul_precision() == "default"
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        assert P.matmul_precision() != "default" or True
        # the override must not leak
        import os

        assert P.matmul_precision() == os.environ.get(
            "DLA_TPU_MATMUL_PRECISION", P.DEFAULT
        )


class TestRefinedHost:
    def test_posv_refined_host_hits_1e10_from_fp32_factor(self):
        """Hybrid refinement (fp32 device factor + host-fp64 residuals) —
        the route to the 1e-10 solve contract on hardware whose fp64
        silently degrades (BASELINE config 3)."""
        from dla_tpu.algos.solve import posv_refined_host

        n = 512
        a = _spd(n, seed=80)
        b = np.arange(n, dtype=np.float64)
        x, err, used = posv_refined_host(a, b, nb=128)
        assert err < 1e-10, (err, used)
        ref = np.linalg.solve(np.tril(a) + np.tril(a, -1).T, b)
        np.testing.assert_allclose(x, ref, rtol=1e-8)


class TestResidualChunked:
    """Row-chunked residual (r3: the HBM-tight validation mode bench.py
    uses at N=32768) must agree with the monolithic form."""

    def test_matches_monolithic(self):
        n = 256
        a = plgsy(n, seed=3, dtype=jnp.float64)
        l = potrf(a, nb=64)
        full = float(residual_potrf(a, l, assume_symmetric=True))
        chunked = float(residual_potrf(a, l, assume_symmetric=True,
                                       assume_tril=True, row_chunk=64))
        assert abs(full - chunked) <= 1e-14 + 1e-6 * full

    def test_max_norm_and_bad_args(self):
        n = 128
        a = plgsy(n, seed=4, dtype=jnp.float64)
        l = potrf(a, nb=32)
        m_full = float(residual_potrf(a, l, norm="M", assume_symmetric=True))
        m_chunk = float(residual_potrf(a, l, norm="M", assume_symmetric=True,
                                       row_chunk=32))
        assert abs(m_full - m_chunk) <= 1e-14 + 1e-6 * m_full
        with pytest.raises(ValueError, match="multiple of row_chunk"):
            residual_potrf(a, l, row_chunk=33)
        with pytest.raises(ValueError, match="norm"):
            residual_potrf(a, l, norm="F", row_chunk=32)

    def test_detects_bad_factor(self):
        n = 128
        a = plgsy(n, seed=5, dtype=jnp.float64)
        l = potrf(a, nb=32)
        bad = l.at[5, 3].add(0.1)
        assert float(residual_potrf(a, bad, assume_symmetric=True,
                                    row_chunk=32)) > 1e-5

    def test_bf16_low_storage_matches_upcast(self):
        """bf16 storage + row_chunk keeps the N² operands in bf16 (per-chunk
        upcast; exact bf16×bf16 products in the wide accumulator) — the
        global-upcast monolithic path OOMs a 16 GiB chip at N=32768 (r3
        campaign failure). Must agree with the monolithic measurement."""
        from dla_tpu.algos import potrf_inplace

        n = 512
        ab = plgsy(n, bump=float(n), seed=7,
                   dtype=jnp.float32).astype(jnp.bfloat16)
        lb = potrf_inplace(ab.copy(), nb=256, tb=256)
        mono = float(residual_potrf(ab, lb, assume_symmetric=True))
        chunk = float(residual_potrf(ab, lb, assume_symmetric=True,
                                     row_chunk=128))
        tril = float(jax.jit(lambda x, y: residual_potrf(
            x, y, assume_symmetric=True, assume_tril=True,
            row_chunk=128))(ab, jnp.tril(lb)))
        assert abs(mono - chunk) <= 0.05 * mono, (mono, chunk)
        assert abs(mono - tril) <= 0.05 * mono, (mono, tril)
        # and it still detects corruption
        bad = lb.at[5, 3].add(1.0)
        assert float(residual_potrf(ab, bad, assume_symmetric=True,
                                    row_chunk=128)) > 1e-2


class TestPotrfInplace:
    """Single-buffer formulation (r3): aliased full-buffer trailing kernel,
    upper triangle passed through — the N=65536-in-core configuration."""

    @pytest.mark.parametrize("n,nb,tb", [(256, 64, 32), (384, 128, 64)])
    def test_vs_lapack_f64(self, n, nb, tb):
        from dla_tpu.algos import potrf_inplace

        a = plgsy(n, seed=n, dtype=jnp.float64)
        out = potrf_inplace(a.copy(), nb=nb, tb=tb)
        ref = scipy.linalg.cholesky(np.asarray(a), lower=True)
        np.testing.assert_allclose(np.tril(np.asarray(out)), ref,
                                   rtol=1e-9, atol=1e-9)
        # the upper triangle passes through (diag-block interiors are
        # zeroed by the tril'd L_kk block writes; off-block-diagonal upper
        # entries keep the input values — check the top-right block)
        np.testing.assert_array_equal(
            np.asarray(out)[:nb, nb:], np.asarray(a)[:nb, nb:]
        )

    def test_mode_inplace_public_api(self):
        a = plgsy(192, seed=9, dtype=jnp.float64)
        l = potrf(a, nb=64, mode="inplace")
        assert float(residual_potrf(a, l, assume_symmetric=True)) < PASS_THRESHOLD
        assert np.abs(np.triu(np.asarray(l), 1)).max() == 0

    @pytest.mark.parametrize("ib,kb", [(32, 64), (64, 32), (128, 128)])
    def test_frontier_knobs(self, ib, kb):
        """The late-r3 frontier knobs: blocked-TRSM inner size ``ib`` and
        trailing k-split ``kb`` (kb == nb is the full-K configuration the
        shipping headline uses — bench.py `high:inplace:1024:1024`). All
        combinations must be bit-for-bit the same factorization to fp64
        tolerance."""
        from dla_tpu.algos import potrf_inplace

        n, nb, tb = 256, 128, 64
        a = plgsy(n, seed=n + ib + kb, dtype=jnp.float64)
        out = potrf_inplace(a.copy(), nb=nb, tb=tb, kb=kb, ib=ib)
        ref = scipy.linalg.cholesky(np.asarray(a), lower=True)
        np.testing.assert_allclose(np.tril(np.asarray(out)), ref,
                                   rtol=1e-9, atol=1e-9)

    def test_bf16_storage_residual_class(self):
        """bf16 storage with fp32 accumulation: the storage-precision
        study's policy point. Residual lands in the bf16 class
        (~N·eps_bf16 ≈ 1e-1 gate at N=256; fp32 would be ~1e-5)."""
        from dla_tpu.algos import potrf_inplace

        n = 256
        a32 = plgsy(n, seed=11, dtype=jnp.float32)
        out = potrf_inplace(a32.astype(jnp.bfloat16), nb=64, tb=32)
        l = np.tril(np.asarray(out, dtype=np.float64))
        aref = np.asarray(a32, np.float64)
        res = np.abs(aref - l @ l.T).max() / np.abs(aref).max()
        assert np.isfinite(res) and res < n * 2 * 0.0039, res  # bf16 class
        assert res > 1e-5  # honest: it IS bf16-storage-limited


class TestFreivaldsDevice:
    """On-device chunked Freivalds (r3): the at-scale in-core validator
    (N=65536 bf16 can hold neither A nor a reconstruction in HBM)."""

    def test_probe_parity_with_native(self):
        from dla_tpu.runtime.staging import _probe_vec
        from dla_tpu.validate.residual import _probe_vec_jnp

        np.testing.assert_allclose(
            np.asarray(_probe_vec_jnp(257, 0xC0FFEE ^ 1)),
            _probe_vec(257, 0xC0FFEE ^ 1).astype(np.float32), rtol=0, atol=0)

    def test_fp32_factor_gate(self):
        from dla_tpu.validate import freivalds_device

        n = 512
        a = plgsy(n, seed=51, dtype=jnp.float32)
        l = potrf(a, nb=128, mode="shrink")
        res = float(freivalds_device(l, seed=51, probes=2, row_chunk=128))
        assert np.isfinite(res) and res < n * 2e-7, res

    def test_detects_corruption(self):
        from dla_tpu.validate import freivalds_device

        n = 256
        a = plgsy(n, seed=51, dtype=jnp.float32)
        l = potrf(a, nb=64)
        bad = l.at[100, 7].add(0.5)
        assert float(freivalds_device(bad, seed=51, row_chunk=64)) > 1e-5

    def test_bf16_factor_class(self):
        from dla_tpu.algos import potrf_inplace
        from dla_tpu.validate import freivalds_device

        n = 512
        a = plgsy(n, seed=51, dtype=jnp.float32)
        out = potrf_inplace(a.astype(jnp.bfloat16), nb=128, tb=64)
        res = float(freivalds_device(out, seed=51, row_chunk=128))
        assert np.isfinite(res) and 1e-6 < res < n * 2 * 0.0039, res


class TestPosvRefinedStreamed:
    """Streamed-A refinement (r3): the N≫host-RAM solve configuration —
    must hit the reference's 1e-10 gate from fp32 AND bf16 factors."""

    @pytest.mark.parametrize("store_dtype", ["float32", "bfloat16"])
    def test_gate_1e10(self, store_dtype):
        from dla_tpu.algos import posv_refined_streamed
        from dla_tpu.algos.potrf import potrf_inplace

        n, panel = 512, 128
        dt = jnp.float32 if store_dtype == "float32" else jnp.bfloat16
        a = plgsy(n, seed=51, dtype=jnp.float32)
        l = potrf_inplace(a.astype(dt), nb=128, tb=64)
        rng = np.random.default_rng(5)
        b = rng.standard_normal(n)
        x, err, used = posv_refined_streamed(
            l, b, seed=51, panel=panel, iters=30, tol=1e-11)
        assert err < 1e-10, (store_dtype, err, used)
        # cross-check against a dense fp64 solve
        a64 = np.asarray(plgsy(n, seed=51, dtype=jnp.float64))
        ref = np.linalg.solve(a64, b)
        np.testing.assert_allclose(x, ref, rtol=1e-7, atol=1e-9)
