"""Gates for the emulated-fp64 (df64) path (ops/df64.py +
algos/potrf_df64.py) — the on-chip route to the reference's fp64
contract (v6_test.c:57 dpotrf, ≤1e-10 residual gate). Everything here
validates against TRUE fp64 on the CPU backend; the on-chip numbers live
in benchmarks/df64_probe.py artifacts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dla_tpu.ops import df64 as D

rng = np.random.default_rng(42)


class TestEFT:
    def test_two_sum_exact(self):
        a = np.float32(1e8)
        b = np.float32(1.0)
        s, e = D.two_sum(jnp.float32(a), jnp.float32(b))
        assert float(s) + float(e) == float(a) + float(b)
        # vectorized, mixed magnitudes/signs: s + e == a + b exactly in fp64
        x = (rng.standard_normal(4096) * np.exp(
            rng.uniform(-30, 30, 4096))).astype(np.float32)
        y = (rng.standard_normal(4096) * np.exp(
            rng.uniform(-30, 30, 4096))).astype(np.float32)
        s, e = jax.jit(D.two_sum)(jnp.asarray(x), jnp.asarray(y))
        lhs = np.asarray(s, np.float64) + np.asarray(e, np.float64)
        rhs = x.astype(np.float64) + y.astype(np.float64)
        np.testing.assert_array_equal(lhs, rhs)

    def test_two_prod_exact(self):
        x = (rng.standard_normal(4096) * np.exp(
            rng.uniform(-15, 15, 4096))).astype(np.float32)
        y = (rng.standard_normal(4096) * np.exp(
            rng.uniform(-15, 15, 4096))).astype(np.float32)
        p, e = jax.jit(D.two_prod)(jnp.asarray(x), jnp.asarray(y))
        lhs = np.asarray(p, np.float64) + np.asarray(e, np.float64)
        rhs = x.astype(np.float64) * y.astype(np.float64)
        np.testing.assert_array_equal(lhs, rhs)


class TestDfArith:
    def _pair(self, v):
        return D.to_df64(v)

    def test_ops_vs_fp64(self):
        x = rng.standard_normal(8192) * np.exp(rng.uniform(-20, 20, 8192))
        y = rng.standard_normal(8192) * np.exp(rng.uniform(-20, 20, 8192))
        xh, xl = self._pair(x)
        yh, yl = self._pair(y)
        for op, ref, tol in [
            (D.df_add, x + y, 5e-13),   # accurate add: stable under
            (D.df_mul, x * y, 5e-14),   # cancellation too
            (D.df_div, x / y, 5e-14),
        ]:
            h, l = jax.jit(op)(xh, xl, yh, yl)
            got = np.asarray(D.from_df64(h, l))
            rel = np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-300))
            assert rel < tol, (op.__name__, rel)

    def test_sqrt(self):
        x = np.abs(rng.standard_normal(8192)) * np.exp(
            rng.uniform(-20, 20, 8192))
        xh, xl = self._pair(x)
        h, l = jax.jit(D.df_sqrt)(xh, xl)
        got = np.asarray(D.from_df64(h, l))
        rel = np.max(np.abs(got - np.sqrt(x)) / np.sqrt(x))
        assert rel < 5e-14, rel
        h0, l0 = D.df_sqrt(jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32))
        assert not np.any(np.isnan(np.asarray(h0)))


class TestSlicing:
    def test_slices_bf16_exact_and_reconstruct(self):
        m, k = 64, 768
        a = rng.standard_normal((m, k)) * np.exp(rng.uniform(-12, 12, (m, 1)))
        ah, al = D.to_df64(a)
        slices, mu = jax.jit(lambda h, l: D.slice_rows(h, l))(ah, al)
        recon = np.zeros((m, k))
        for st in slices:
            f32 = np.asarray(st.astype(jnp.float32))
            # every slice must be EXACTLY bf16-representable (w=8 bits)
            rt = np.asarray(
                jnp.asarray(f32).astype(jnp.bfloat16).astype(jnp.float32))
            np.testing.assert_array_equal(rt, f32)
            recon += f32.astype(np.float64)
        err = np.max(np.abs(recon - a) / np.asarray(mu))
        assert err < 2.0**-46, err  # bound 2^-48 with rounding slack

    def test_max_exact_chunk(self):
        assert D.max_exact_chunk(8) == 1024
        assert D.max_exact_chunk(7) == 4096


class TestDf64Gemm:
    @pytest.mark.parametrize("m,n,k", [(64, 48, 256), (96, 64, 2048),
                                       (128, 128, 4096)])
    def test_vs_fp64(self, m, n, k):
        a = rng.standard_normal((m, k)) * np.exp(rng.uniform(-6, 6, (m, 1)))
        b = rng.standard_normal((n, k)) * np.exp(rng.uniform(-6, 6, (n, 1)))
        ah, al = D.to_df64(a)
        bh, bl = D.to_df64(b)
        ch, cl = jax.jit(lambda *t: D.df64_matmul_nt(*t))(ah, al, bh, bl)
        got = np.asarray(D.from_df64(ch, cl))
        scale = np.abs(a) @ np.abs(b).T
        rel = np.max(np.abs(got - a @ b.T) / scale)
        assert rel < 1e-13, rel

    def test_preslicing_matches(self):
        m, k = 64, 512
        a = rng.standard_normal((m, k))
        ah, al = D.to_df64(a)
        sx = D.slice_rows(ah, al)[0]
        c1 = D.df64_matmul_nt(ah, al, ah, al)
        c2 = D.df64_matmul_nt(ah, al, ah, al, slices_a=sx, slices_b=sx)
        np.testing.assert_array_equal(np.asarray(c1[0]), np.asarray(c2[0]))
        np.testing.assert_array_equal(np.asarray(c1[1]), np.asarray(c2[1]))

    def test_more_slices_more_accurate(self):
        m, k = 64, 2048
        a = rng.standard_normal((m, k))
        b = rng.standard_normal((m, k))
        ah, al = D.to_df64(a)
        bh, bl = D.to_df64(b)
        errs = []
        for s in (4, 5, 6, 7):
            ch, cl = D.df64_matmul_nt(ah, al, bh, bl, s=s)
            got = np.asarray(D.from_df64(ch, cl))
            errs.append(np.max(np.abs(got - a @ b.T) /
                               (np.abs(a) @ np.abs(b).T)))
        assert errs[0] > errs[1] > errs[2] > errs[3]


class TestDf64TrailingKernel:
    def test_kernel_matches_fp64_on_lower_tiles(self):
        from dla_tpu.kernels.df64_tiles import trailing_update_df64

        m, nb, tb = 384, 128, 128
        c = rng.standard_normal((m, m))
        p = rng.standard_normal((m, nb))
        ch, cl = D.to_df64(c)
        ph, plo = D.to_df64(p)
        sx = D.slice_rows(ph, plo, s=7)[0]
        och, ocl = trailing_update_df64(ch, cl, list(sx), tb=tb)
        got = np.asarray(och, np.float64) + np.asarray(ocl, np.float64)
        ref = c - p @ p.T
        for i in range(0, m, tb):
            for j in range(0, i + tb, tb):
                np.testing.assert_allclose(
                    got[i:i + tb, j:j + tb], ref[i:i + tb, j:j + tb],
                    rtol=0, atol=1e-10)

    def test_kernel_origin_and_kchunks(self):
        from dla_tpu.kernels.df64_tiles import trailing_update_df64
        from dla_tpu.ops.df64 import max_exact_chunk

        m, nb, tb, origin = 512, 512, 128, 1
        assert nb > max_exact_chunk(9)  # force nk > 1 via w=9
        c = rng.standard_normal((m, m))
        p = rng.standard_normal((m - origin * tb, nb))
        ch, cl = D.to_df64(c)
        ph, plo = D.to_df64(p)
        sx = D.slice_rows(ph, plo, s=6, w=9)[0]
        och, ocl = trailing_update_df64(
            ch, cl, list(sx), tb=tb, origin=origin, w=9)
        got = np.asarray(och, np.float64) + np.asarray(ocl, np.float64)
        o = origin * tb
        # the df64-rounded input is the passthrough reference (to_df64
        # already dropped bits beyond 2^-49 of c)
        c_df = np.asarray(ch, np.float64) + np.asarray(cl, np.float64)
        ref = c_df.copy()
        ref[o:, o:] -= p @ p.T
        # untouched first tile row/col passes through (aliased)
        np.testing.assert_array_equal(got[:o, :], c_df[:o, :])
        for i in range(o, m, tb):
            for j in range(o, i + tb, tb):
                np.testing.assert_allclose(
                    got[i:i + tb, j:j + tb], ref[i:i + tb, j:j + tb],
                    rtol=0, atol=1e-9)

    def test_potrf_pallas_trailing_matches_xla(self):
        from dla_tpu.algos.potrf_df64 import potrf_df64

        n, nb = 512, 128
        g = rng.standard_normal((n, n))
        a = (g + g.T) / 2 + n * np.eye(n)
        ah, al = D.to_df64(a)
        lx = potrf_df64(ah, al, nb=nb, trailing="xla")
        lp = potrf_df64(ah, al, nb=nb, trailing="pallas", tb=128)
        for x, p in zip(lx, lp):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(p), rtol=0, atol=1e-9)
        l = np.asarray(D.from_df64(*lp))
        res = np.abs(a - l @ l.T).sum(1).max() / np.abs(a).sum(1).max()
        assert res < 1e-11, res

    def test_potrf_pallas_trailing_tb_below_nb(self):
        """Regression (r4 on-chip find): with tb < nb the pair grid leaves
        the diagonal block's upper TILES stale, and the refinement's
        E = A − L·Lᵀ read them — residuals collapsed to 1e-6 on chip.
        The diag factor now re-symmetrizes from the lower triangle."""
        from dla_tpu.algos.potrf_df64 import potrf_df64

        n, nb, tb = 768, 256, 128
        g = rng.standard_normal((n, n))
        a = (g + g.T) / 2 + n * np.eye(n)
        ah, al = D.to_df64(a)
        lh, ll = potrf_df64(ah, al, nb=nb, trailing="pallas", tb=tb)
        l = np.asarray(D.from_df64(lh, ll))
        res = np.abs(a - l @ l.T).sum(1).max() / np.abs(a).sum(1).max()
        assert res < 1e-11, res


class TestPotrfDf64:
    @pytest.mark.parametrize("n,nb", [(256, 64), (512, 128)])
    def test_vs_scipy_fp64(self, n, nb):
        import scipy.linalg

        from dla_tpu.algos.potrf_df64 import potrf_df64

        g = rng.standard_normal((n, n))
        a = (g + g.T) / 2 + n * np.eye(n)
        ah, al = D.to_df64(a)
        lh, ll = potrf_df64(ah, al, nb=nb)
        l = np.asarray(D.from_df64(lh, ll))
        ref = scipy.linalg.cholesky(a, lower=True)
        ferr = np.max(np.abs(l - ref)) / np.max(np.abs(ref))
        assert ferr < 1e-12, ferr
        res = np.abs(a - l @ l.T).sum(1).max() / np.abs(a).sum(1).max()
        assert res < 1e-11, res  # the reference's 1e-10 gate, with margin

    def test_device_residual_agrees_with_fp64(self):
        from dla_tpu.algos.potrf_df64 import potrf_df64, residual_potrf_df64

        n = 384
        g = rng.standard_normal((n, n))
        a = (g + g.T) / 2 + n * np.eye(n)
        ah, al = D.to_df64(a)
        lh, ll = potrf_df64(ah, al, nb=128)
        l = np.asarray(D.from_df64(lh, ll))
        res64 = np.abs(a - l @ l.T).sum(1).max() / np.abs(a).sum(1).max()
        resdev = float(residual_potrf_df64(ah, al, lh, ll))
        # the device norm is an |h|+|l| upper bound: same decade
        assert res64 < resdev < 50 * res64 + 1e-13, (res64, resdev)
        assert resdev < 1e-10  # the gate, measured entirely on device

    def test_blocked_residual_matches_strip_path(self):
        """The block-tiled residual (never holds the full slice set —
        the HBM-feasible path past N=8192 on chip) agrees with the
        strip path and the host fp64 truth, including ragged strips
        and stale-upper factors (the tril mask must neutralize them)."""
        from dla_tpu.algos.potrf_df64 import (
            potrf_df64,
            residual_potrf_df64,
            residual_potrf_df64_blocked,
        )

        n = 384
        g = rng.standard_normal((n, n))
        a = (g + g.T) / 2 + n * np.eye(n)
        ah, al = D.to_df64(a)
        lh, ll = potrf_df64(ah, al, nb=128)
        # poison the strict upper triangle: the blocked path masks it
        iu = np.triu_indices(n, 1)
        lh_st = np.asarray(lh).copy()
        lh_st[iu] = 7.0
        l = np.asarray(D.from_df64(lh, ll))
        res64 = np.abs(a - l @ l.T).sum(1).max() / np.abs(a).sum(1).max()
        res_strip = float(residual_potrf_df64(ah, al, lh, ll))
        for rc in (128, 160):  # 160: ragged last strip (384 = 2*160+64)
            res_blk = residual_potrf_df64_blocked(
                ah, al, jnp.asarray(lh_st), ll, rc=rc)
            assert res_blk < 1e-10, (rc, res_blk)
            # same |h|+|l| overbound, same decade as both other paths
            assert abs(res_blk - res_strip) < 0.5 * res_strip + 1e-14, (
                rc, res_blk, res_strip)
            assert res64 < res_blk < 50 * res64 + 1e-13, (rc, res_blk)

    def test_blocked_residual_al_none(self):
        """al=None (A exactly fp32, the frontier-probe input contract):
        no zeros plane, same result as an explicit zero lo plane."""
        from dla_tpu.algos.potrf_df64 import (
            potrf_df64,
            residual_potrf_df64_blocked,
        )

        n = 256
        g = rng.standard_normal((n, n))
        a32 = np.asarray((g + g.T) / 2 + n * np.eye(n), np.float32)
        a = a32.astype(np.float64)  # A is exactly fp32
        ah = jnp.asarray(a32)
        al = jnp.zeros_like(ah)
        lh, ll = potrf_df64(ah, al, nb=128)
        r_none = residual_potrf_df64_blocked(ah, None, lh, ll, rc=128)
        r_zero = residual_potrf_df64_blocked(ah, al, lh, ll, rc=128)
        assert r_none == r_zero, (r_none, r_zero)
        l = np.asarray(D.from_df64(lh, ll))
        res64 = np.abs(a - l @ l.T).sum(1).max() / np.abs(a).sum(1).max()
        assert res64 < r_none < 50 * res64 + 1e-13, (res64, r_none)
        assert r_none < 1e-10

    def test_s7_tightens_the_floor(self):
        from dla_tpu.algos.potrf_df64 import potrf_df64

        n = 512
        g = rng.standard_normal((n, n))
        a = (g + g.T) / 2 + n * np.eye(n)
        ah, al = D.to_df64(a)
        res = {}
        for s in (5, 7):
            lh, ll = potrf_df64(ah, al, nb=128, s=s)
            l = np.asarray(D.from_df64(lh, ll))
            res[s] = np.abs(a - l @ l.T).sum(1).max() / np.abs(a).sum(1).max()
        assert res[7] < res[5] / 10, res

    def test_rejects_bad_shapes(self):
        from dla_tpu.algos.potrf_df64 import potrf_df64

        with pytest.raises(ValueError, match="multiple"):
            potrf_df64(jnp.eye(100, dtype=jnp.float32),
                       jnp.zeros((100, 100), jnp.float32), nb=64)

    def test_freivalds_df64_tracks_and_discriminates(self):
        """The streaming df64 Freivalds gate (frontier-size validation:
        O(n²) matvecs, strip-bounded slice memory) must track the exact
        residual's decade and catch a corrupted factor."""
        from dla_tpu.algos.potrf_df64 import (
            freivalds_potrf_df64, potrf_df64,
        )

        n = 512
        g = rng.standard_normal((n, n))
        a = (g + g.T) / 2 + n * np.eye(n)
        ah, al = D.to_df64(a)
        lh, ll = potrf_df64(ah, al, nb=128)
        fr = float(freivalds_potrf_df64(lh, ll, ah, al, row_chunk=256))
        assert fr < 1e-11, fr
        bad = lh.at[5, 3].add(np.float32(1e-4))
        fr_bad = float(freivalds_potrf_df64(bad, ll, ah, al, row_chunk=256))
        assert fr_bad > 1e-9, fr_bad

    def test_potrs_df64_meets_posv_gate(self):
        """The fp64-contract SOLVE on the accelerator dtype path: factor
        + solve entirely in df64 must meet the reference's 1e-10 posv
        gate (v6_test.c:87) against true fp64."""
        from dla_tpu.algos.potrf_df64 import potrf_df64, potrs_df64

        n, nrhs = 384, 4
        g = rng.standard_normal((n, n))
        a = (g + g.T) / 2 + n * np.eye(n)
        b = rng.standard_normal((n, nrhs))
        ah, al = D.to_df64(a)
        bh, bl = D.to_df64(b)
        lh, ll = potrf_df64(ah, al, nb=128)
        xh, xl = potrs_df64(lh, ll, bh, bl)
        x = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
        res = np.abs(b - a @ x).max() / (np.abs(a).max() * np.abs(x).max())
        assert res < 1e-12, res  # 1e-10 gate with margin


class TestPotrfPackedDf64:
    """packed × df64: the triangle-only-storage emulated-fp64 factor
    (the √2 frontier extension over the dense df64 pair)."""

    def _spd(self, n):
        g = rng.standard_normal((n, n))
        return (g + g.T) / 2 + n * np.eye(n)

    @pytest.mark.parametrize("n,nb,ktb", [(512, 128, 128), (768, 256, 128)])
    def test_vs_scipy_fp64(self, n, nb, ktb):
        import scipy.linalg

        from dla_tpu.algos.packed import pack_tri, unpack_tri
        from dla_tpu.algos.potrf_df64 import potrf_packed_df64

        a = self._spd(n)
        ah, al = D.to_df64(a)
        lph, lpl = potrf_packed_df64(
            pack_tri(ah, nb), pack_tri(al, nb), n, nb, ktb=ktb)
        lh = unpack_tri(lph, n, nb)
        ll = unpack_tri(lpl, n, nb)
        l = np.asarray(D.from_df64(lh, ll))
        ref = scipy.linalg.cholesky(a, lower=True)
        ferr = np.max(np.abs(l - ref)) / np.max(np.abs(ref))
        assert ferr < 1e-12, ferr
        res = np.abs(a - l @ l.T).sum(1).max() / np.abs(a).sum(1).max()
        assert res < 1e-11, res  # the reference's 1e-10 gate, with margin

    def test_matches_dense_df64(self):
        """Same pass loop, same tile visit order — the packed factor must
        match the dense pallas-trailing factor to accumulation noise."""
        from dla_tpu.algos.packed import pack_tri, unpack_tri
        from dla_tpu.algos.potrf_df64 import potrf_df64, potrf_packed_df64

        n, nb, ktb = 512, 128, 128
        a = self._spd(n)
        ah, al = D.to_df64(a)
        dh, dl = potrf_df64(ah, al, nb=nb, trailing="pallas", tb=ktb)
        lph, lpl = potrf_packed_df64(
            pack_tri(ah, nb), pack_tri(al, nb), n, nb, ktb=ktb)
        d = np.asarray(D.from_df64(dh, dl))
        p = np.asarray(D.from_df64(unpack_tri(lph, n, nb),
                                   unpack_tri(lpl, n, nb)))
        np.testing.assert_allclose(p, d, rtol=0, atol=1e-9)

    def test_plgsy_packed_pair_input(self):
        """The frontier input path: device-generated exactly-fp32 packed
        A (lo = 0) — factor straight from ``plgsy_packed`` planes, gate
        against the dense fp64 reconstruction."""
        from dla_tpu.algos.packed import plgsy_packed, unpack_tri
        from dla_tpu.algos.potrf_df64 import potrf_packed_df64
        from dla_tpu.ops import plgsy

        n, nb = 512, 128
        aph = plgsy_packed(n, nb, seed=51)
        lph, lpl = potrf_packed_df64(
            aph, jnp.zeros_like(aph), n, nb, ktb=128)
        l = np.asarray(D.from_df64(unpack_tri(lph, n, nb),
                                   unpack_tri(lpl, n, nb)))
        a = np.asarray(plgsy(n, bump=float(n), seed=51), np.float64)
        a = np.tril(a) + np.tril(a, -1).T  # the factor reproduces tril(A)
        res = np.abs(a - l @ l.T).sum(1).max() / np.abs(a).sum(1).max()
        assert res < 1e-11, res

    def test_rejects_bad_tiles(self):
        from dla_tpu.algos.potrf_df64 import potrf_packed_df64

        z = jnp.zeros((640, 128), jnp.float32)
        with pytest.raises(ValueError, match="ktb"):
            potrf_packed_df64(z, z, 512, 128, ktb=96)

    def test_split_auto_sizing(self):
        """split=0 (auto: ceil(nt/40) segments, <= 40 steps/program —
        inside the measured compile-wall bracket) must execute and meet
        the gate; at nt=4 it degenerates to the monolith."""
        from dla_tpu.algos.packed import pack_tri, unpack_tri
        from dla_tpu.algos.potrf_df64 import potrf_packed_df64_split

        n, nb = 256, 64
        a = self._spd(n)
        ah, al = D.to_df64(a)
        sh, sl = potrf_packed_df64_split(
            pack_tri(ah, nb), pack_tri(al, nb), n, nb, split=0, ktb=64)
        p = np.asarray(D.from_df64(unpack_tri(sh, n, nb),
                                   unpack_tri(sl, n, nb)))
        res = np.abs(a - p @ p.T).sum(1).max() / np.abs(a).sum(1).max()
        assert res < 1e-11, res

    @pytest.mark.parametrize("split", [2, 3, 8])
    def test_split_matches_monolith(self, split):
        """Segmented execution (the compile-wall route, potrf_packed_
        df64_split) runs the same step sequence across several jitted
        programs — the factor must match the monolith and the residual
        must hold the 1e-10 gate. split=8 > nt exercises the clamp."""
        from dla_tpu.algos.packed import pack_tri, unpack_tri
        from dla_tpu.algos.potrf_df64 import (
            potrf_packed_df64, potrf_packed_df64_split)

        n, nb, ktb = 512, 128, 128
        a = self._spd(n)
        ah, al = D.to_df64(a)
        mh, ml = potrf_packed_df64(
            pack_tri(ah, nb), pack_tri(al, nb), n, nb, ktb=ktb)
        sh, sl = potrf_packed_df64_split(
            pack_tri(ah, nb), pack_tri(al, nb), n, nb, split=split,
            ktb=ktb)
        m = np.asarray(D.from_df64(unpack_tri(mh, n, nb),
                                   unpack_tri(ml, n, nb)))
        p = np.asarray(D.from_df64(unpack_tri(sh, n, nb),
                                   unpack_tri(sl, n, nb)))
        np.testing.assert_allclose(p, m, rtol=0, atol=1e-12)
        res = np.abs(a - p @ p.T).sum(1).max() / np.abs(a).sum(1).max()
        assert res < 1e-11, res

    def test_potrs_packed_df64_meets_posv_gate(self):
        """Factor + solve entirely in df64 ON PACKED STORAGE must meet
        the reference's 1e-10 posv gate (v6_test.c:87) vs true fp64 —
        the frontier-size solve where the dense pair cannot be unpacked
        next to B."""
        from dla_tpu.algos.packed import pack_tri
        from dla_tpu.algos.potrf_df64 import (
            potrf_packed_df64, potrs_packed_df64,
        )

        n, nb, nrhs = 512, 128, 4
        a = self._spd(n)
        b = rng.standard_normal((n, nrhs))
        ah, al = D.to_df64(a)
        bh, bl = D.to_df64(b)
        lph, lpl = potrf_packed_df64(
            pack_tri(ah, nb), pack_tri(al, nb), n, nb, ktb=128)
        xh, xl = potrs_packed_df64(lph, lpl, bh, bl, n, nb)
        x = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
        res = np.abs(b - a @ x).max() / (np.abs(a).max() * np.abs(x).max())
        assert res < 1e-12, res  # 1e-10 gate with margin

    def test_potrs_packed_df64_matvec_engine(self):
        """The compact-program serving engine (engine='matvec': the
        descriptor-table fori reconstruction instead of ~28·nt unrolled
        trmm dots — the remote-compile-safe path at frontier nt) must
        meet the same posv gate as the trmm engine."""
        from dla_tpu.algos.packed import pack_tri
        from dla_tpu.algos.potrf_df64 import (
            potrf_packed_df64, potrs_packed_df64,
        )

        n, nb, nrhs = 512, 128, 4
        a = self._spd(n)
        b = rng.standard_normal((n, nrhs))
        ah, al = D.to_df64(a)
        bh, bl = D.to_df64(b)
        lph, lpl = potrf_packed_df64(
            pack_tri(ah, nb), pack_tri(al, nb), n, nb, ktb=128)
        xh, xl = potrs_packed_df64(lph, lpl, bh, bl, n, nb,
                                   engine="matvec")
        x = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
        res = np.abs(b - a @ x).max() / (np.abs(a).max() * np.abs(x).max())
        assert res < 1e-12, res

    def test_packed_kernel_kchunks_match_fp64(self):
        """The packed pass-loop kernel with nk > 1 k-chunks (w=9 forces
        chunk=256 < nb=512) — the configuration the on-chip nb=2048
        frontier runs (kb=1024, nk=2) at CPU-testable size."""
        from dla_tpu.algos.packed import pack_tri, unpack_tri
        from dla_tpu.kernels.df64_tiles import trailing_update_packed_df64
        from dla_tpu.ops.df64 import max_exact_chunk

        n, nb, tb, k = 1024, 512, 128, 0
        assert nb > max_exact_chunk(9)
        a = self._spd(n)
        p = rng.standard_normal((n - (k + 1) * nb, nb))
        ah, al = D.to_df64(a)
        aph, apl = pack_tri(ah, nb), pack_tri(al, nb)
        ph, plo = D.to_df64(p)
        sx = D.slice_rows(ph, plo, s=6, w=9)[0]
        oh, ol = trailing_update_packed_df64(
            aph, apl, list(sx), n=n, nb=nb, k=k, tb=tb, w=9)
        got = (np.asarray(unpack_tri(oh, n, nb), np.float64)
               + np.asarray(unpack_tri(ol, n, nb), np.float64))
        a_df = np.asarray(ah, np.float64) + np.asarray(al, np.float64)
        ref = np.tril(a_df)
        o = (k + 1) * nb
        ref[o:, o:] -= np.tril(p @ p.T)
        # slab k passes through untouched; trailing lower tiles updated
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-9)

    def test_freivalds_packed_native_matches_resident_gate(self):
        """The packed-native streaming gate (r5: certifies the record
        runs — no unpack, no dense A; A strip-streamed from its seed)
        must agree with the resident-A dense gate on the same factor
        and catch a corrupted factor."""
        from dla_tpu.algos.packed import plgsy_packed, unpack_tri
        from dla_tpu.algos.potrf_df64 import (
            freivalds_packed_df64, freivalds_potrf_df64,
            potrf_packed_df64,
        )
        from dla_tpu.ops import plgsy

        n, nb = 512, 128
        aph = plgsy_packed(n, nb, seed=51)
        lph, lpl = potrf_packed_df64(
            aph, jnp.zeros_like(aph), n, nb, ktb=128)
        fr = float(freivalds_packed_df64(lph, lpl, n, nb, row_chunk=128))
        assert fr < 1e-11, fr
        # cross-check vs the resident-A dense gate on the unpacked factor
        lh, ll = unpack_tri(lph, n, nb), unpack_tri(lpl, n, nb)
        a32 = plgsy(n, bump=float(n), seed=51, dtype=jnp.float32)
        ref = float(freivalds_potrf_df64(
            lh, ll, a32, None, row_chunk=128))
        assert abs(fr - ref) < max(1e-13, 0.5 * ref), (fr, ref)
        bad = lph.at[5, 3].add(np.float32(1e-4))
        fr_bad = float(freivalds_packed_df64(bad, lpl, n, nb,
                                             row_chunk=128))
        assert fr_bad > 1e-9, fr_bad

    def test_blocked_residual_gen_mode_matches_resident(self):
        """The generator-streamed blocked v6-exact gate (r5: no A plane
        resident — the dense-frontier certification) must equal the
        resident-A blocked gate bit-for-bit on the seeded matrix."""
        from dla_tpu.algos.potrf_df64 import (
            potrf_df64, residual_potrf_df64_blocked,
        )
        from dla_tpu.ops import plgsy

        n = 512
        a32 = plgsy(n, bump=float(n), seed=51, dtype=jnp.float32)
        lh, ll = potrf_df64(a32, jnp.zeros_like(a32), nb=128)
        r_res = residual_potrf_df64_blocked(a32, None, lh, ll, rc=128)
        r_gen = residual_potrf_df64_blocked(
            None, None, lh, ll, rc=128, gen_seed=51)
        assert r_gen < 1e-11, r_gen
        assert r_res == r_gen, (r_res, r_gen)
        with pytest.raises(ValueError, match="rc"):
            residual_potrf_df64_blocked(
                None, None, lh, ll, rc=96, gen_seed=51)

    def test_freivalds_gen_streamed_matches_resident_gate(self):
        """The generator-streamed DENSE gate (r5: drops the resident A
        plane that RESOURCE_EXHAUSTed the r4 dense-frontier cert) must
        reproduce the resident-A gate on the same factor."""
        from dla_tpu.algos.potrf_df64 import (
            freivalds_potrf_df64, freivalds_potrf_df64_gen, potrf_df64,
        )
        from dla_tpu.ops import plgsy

        n = 512
        a32 = plgsy(n, bump=float(n), seed=51, dtype=jnp.float32)
        lh, ll = potrf_df64(a32, jnp.zeros_like(a32), nb=128)
        fr = float(freivalds_potrf_df64_gen(lh, ll, row_chunk=128))
        ref = float(freivalds_potrf_df64(
            lh, ll, a32, None, row_chunk=128))
        assert fr < 1e-11, fr
        assert abs(fr - ref) < max(1e-13, 0.05 * ref), (fr, ref)

    def test_trmm_packed_df64_matches_fp64(self):
        from dla_tpu.algos.packed import pack_tri
        from dla_tpu.algos.potrf_df64 import trmm_packed_df64

        n, nb, p = 384, 128, 3
        lt = np.tril(rng.standard_normal((n, n)))
        x = rng.standard_normal((n, p))
        lh, ll = D.to_df64(lt)
        xh, xl = D.to_df64(x)
        for trans in (False, True):
            yh, yl = trmm_packed_df64(
                pack_tri(lh, nb), pack_tri(ll, nb), xh, xl, n, nb,
                trans=trans)
            y = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
            ref = (lt.T if trans else lt) @ x
            err = np.abs(y - ref).max() / np.abs(ref).max()
            assert err < 1e-13, (trans, err)
