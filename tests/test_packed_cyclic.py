"""Packed column-cyclic distributed POTRF (parallel/packed_cyclic.py):
triangle-only storage × the flat-mesh Pallas-ring data plane — per-device
resident ≈ n²/(2·D) vs the dense column-cyclic path's n²/D."""

import jax.numpy as jnp
import numpy as np
import pytest

from dla_tpu.ops import plgsy
from dla_tpu.parallel import (
    make_flat_mesh,
    pack_cols_packed,
    potrf_packed_cyclic,
    resident_elems,
    unpack_cols_packed,
)


class TestPackedCyclic:
    @pytest.mark.parametrize("n,nb,ndev", [(768, 32, 8), (256, 16, 4)])
    def test_matches_lapack_fp64(self, n, nb, ndev):
        import scipy.linalg

        mesh = make_flat_mesh(ndev)
        a = plgsy(n, seed=51, dtype=jnp.float64)
        x = pack_cols_packed(np.asarray(a), nb, mesh)
        lx = potrf_packed_cyclic(x, n, nb, mesh)
        l = unpack_cols_packed(lx, n, nb, mesh)
        ref = scipy.linalg.cholesky(np.asarray(a), lower=True)
        np.testing.assert_allclose(l, ref, rtol=1e-9, atol=1e-12)

    def test_gate_1e10(self):
        from dla_tpu.validate import residual_potrf

        n, nb, ndev = 512, 16, 8
        mesh = make_flat_mesh(ndev)
        a = plgsy(n, seed=7, dtype=jnp.float64)
        x = pack_cols_packed(np.asarray(a), nb, mesh)
        lx = potrf_packed_cyclic(x, n, nb, mesh)
        l = jnp.asarray(unpack_cols_packed(lx, n, nb, mesh))
        res = float(residual_potrf(a, l))
        assert res < 1e-10, res

    def test_pack_unpack_roundtrip(self):
        n, nb, ndev = 256, 16, 8
        mesh = make_flat_mesh(ndev)
        a = np.tril(np.asarray(plgsy(n, seed=3, dtype=jnp.float64)))
        x = pack_cols_packed(a, nb, mesh)
        back = unpack_cols_packed(x, n, nb, mesh)
        np.testing.assert_array_equal(back, a)

    def test_resident_memory_halved(self):
        # the packed shard is ~(0.5 + 1/(2·ltc)) of the dense column shard
        for n, nb, ndev in [(4096, 64, 8), (8192, 128, 4)]:
            packed, dense = resident_elems(n, nb, ndev)
            ltc = (n // nb) // ndev
            expect = 0.5 + 1 / (2 * ltc)
            assert abs(packed / dense - expect) < 1e-9

    def test_rejects_bad_geometry(self):
        mesh = make_flat_mesh(8)
        a = np.eye(256)
        with pytest.raises(ValueError, match="multiple of mesh"):
            potrf_packed_cyclic(jnp.zeros((8, 64)), 256, 64, mesh)  # nt=4
        with pytest.raises(ValueError, match="pack_cols_packed"):
            potrf_packed_cyclic(
                jnp.zeros((8, 16)), 256, 16, mesh)
        # ltc=1 edge case (one slab per device) works
        x = pack_cols_packed(a, 32, mesh)  # nt=8, D=8
        lx = potrf_packed_cyclic(x, 256, 32, mesh)
        l = unpack_cols_packed(lx, 256, 32, mesh)
        np.testing.assert_allclose(l, np.eye(256), atol=1e-12)


class TestPackedCyclicDf64:
    """Distributed df64 (r5): the reference's fp64 contract ON the mesh —
    the df64 ARITHMETIC exercised under sharding (fp32 planes on the
    virtual mesh, not CPU x64)."""

    def test_meets_1e10_gate_with_df64_arithmetic(self):
        import scipy.linalg

        from dla_tpu.ops.df64 import to_df64
        from dla_tpu.parallel import potrf_packed_cyclic_df64

        n, nb, ndev = 256, 16, 8
        mesh = make_flat_mesh(ndev)
        a = np.asarray(plgsy(n, seed=13, dtype=jnp.float64))
        ah, al = to_df64(a)
        xh = pack_cols_packed(np.asarray(ah), nb, mesh)
        xl = pack_cols_packed(np.asarray(al), nb, mesh)
        lxh, lxl = potrf_packed_cyclic_df64(xh, xl, n, nb, mesh)
        l = (np.asarray(unpack_cols_packed(lxh, n, nb, mesh), np.float64)
             + np.asarray(unpack_cols_packed(lxl, n, nb, mesh), np.float64))
        ref = scipy.linalg.cholesky(a, lower=True)
        ferr = np.max(np.abs(l - ref)) / np.max(np.abs(ref))
        assert ferr < 1e-12, ferr  # df64 floor, far under fp32's ~1e-7
        res = np.abs(a - l @ l.T).sum(1).max() / np.abs(a).sum(1).max()
        assert res < 1e-11, res  # the reference's 1e-10 gate, with margin

    def test_single_slab_edge_and_rejects(self):
        from dla_tpu.parallel import potrf_packed_cyclic_df64

        mesh = make_flat_mesh(8)
        with pytest.raises(ValueError, match="multiple of mesh"):
            z = jnp.zeros((8, 64), jnp.float32)
            potrf_packed_cyclic_df64(z, z, 256, 64, mesh)  # nt=4
        with pytest.raises(ValueError, match="pack_cols_packed"):
            z = jnp.zeros((8, 16), jnp.float32)
            potrf_packed_cyclic_df64(z, z, 256, 16, mesh)
        # ltc=1 (one slab per device): identity stays exact
        a = np.eye(256, dtype=np.float32)
        x = pack_cols_packed(a, 32, mesh)
        zl = jnp.zeros_like(x)
        lh, ll = potrf_packed_cyclic_df64(x, zl, 256, 32, mesh)
        l = (np.asarray(unpack_cols_packed(lh, 256, 32, mesh), np.float64)
             + np.asarray(unpack_cols_packed(ll, 256, 32, mesh), np.float64))
        np.testing.assert_allclose(l, np.eye(256), atol=1e-12)


class TestCommPinnedToDataPlane:
    def test_ring_broadcast_volumes_match_accounting(self, monkeypatch):
        """The scaling model's comm term (packed_cyclic_accounting) must
        match the REAL program's ring_broadcast operands exactly: trace
        `_potrf_local_packed` with a recording stub and compare every
        call's element count — the packed analogue of the HLO collective
        pin in tests/test_model.py."""
        import jax

        from dla_tpu.parallel import packed_cyclic
        from dla_tpu.parallel.model import packed_cyclic_accounting

        n, nb, ndev = 384, 16, 4  # fresh (n, nb) — never jitted elsewhere
        mesh = make_flat_mesh(ndev)
        calls = []

        def recorder(x, *args, **kwargs):
            calls.append(int(np.prod(x.shape)))
            return x

        monkeypatch.setattr(packed_cyclic, "ring_broadcast", recorder)
        a = np.asarray(plgsy(n, seed=11, dtype=jnp.float64))
        x = pack_cols_packed(a, nb, mesh)
        jax.eval_shape(
            lambda v: packed_cyclic._potrf_jit_n(v, n, nb, mesh, None), x)

        acc = packed_cyclic_accounting(n, nb, ndev)
        expected = []
        for s in acc["steps"]:
            expected.append(nb * nb)  # the factor tile
            rest = s["bcast_elems"] - nb * nb
            if rest:
                expected.append(rest)  # the solved envelope panel
        assert calls == expected
