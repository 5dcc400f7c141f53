"""Native runtime (C++ tile store) and out-of-core POTRF tests."""

import numpy as np
import pytest
import scipy.linalg

from dla_tpu.runtime.staging import (
    DirectPanelStore,
    HostTileStore,
    freivalds_streaming,
)


class TestNativeLib:
    def test_plgsy_matches_jax_generator(self):
        """The C++ generator must be bit-identical to the JAX one — the
        property that lets host-resident and device-resident tiles agree."""
        import jax.numpy as jnp

        from dla_tpu.ops import plgsy

        n = 96
        with HostTileStore(n, np.float32) as st:
            st.fill_plgsy(seed=51, bump=float(n))
            ref = np.asarray(plgsy(n, bump=float(n), seed=51, dtype=jnp.float32))
            np.testing.assert_array_equal(st.array, ref)

    def test_plgsy_f64(self):
        n = 32
        with HostTileStore(n, np.float64) as st:
            st.fill_plgsy(seed=7)
            np.testing.assert_allclose(st.array, st.array.T)
            assert np.all(np.abs(st.array - float(n) * np.eye(n)) <= 0.5)

    def test_pack_unpack_roundtrip(self):
        n = 64
        with HostTileStore(n, np.float32) as st:
            st.array[:] = np.arange(n * n, dtype=np.float32).reshape(n, n)
            t = st.pack(16, 32, 24, 16)
            np.testing.assert_array_equal(t, st.array[16:40, 32:48])
            st.unpack(0, 0, t * 2)
            np.testing.assert_array_equal(st.array[:24, :16], t * 2)

    def test_norm_inf_sym_lower(self):
        n = 48
        rng = np.random.default_rng(0)
        g = rng.standard_normal((n, n))
        a = (g + g.T) / 2 + n * np.eye(n)
        with HostTileStore(n, np.float64) as st:
            st.array[:] = np.tril(a)
            got = st.norm_inf_sym_lower()
        ref = np.abs(a).sum(axis=1).max()
        np.testing.assert_allclose(got, ref, rtol=1e-12)

    def test_freivalds_detects_good_and_bad(self):
        n = 64
        rng = np.random.default_rng(1)
        g = rng.standard_normal((n, n))
        a = (g + g.T) / 2 + n * np.eye(n)
        l = scipy.linalg.cholesky(a, lower=True)
        with HostTileStore(n, np.float64) as sa, HostTileStore(n, np.float64) as sl:
            sa.array[:] = np.tril(a)
            sl.array[:] = l
            good = sa.freivalds_residual(sl)
            sl.array[3, 2] += 1.0  # corrupt the factor
            bad = sa.freivalds_residual(sl)
        assert good < 1e-12, good
        assert bad > 1e-6, bad

    def test_memmap_backed(self, tmp_path):
        n = 32
        p = str(tmp_path / "mat.bin")
        with HostTileStore(n, np.float32, path=p) as st:
            st.fill_plgsy(seed=3)
            first = st.array.copy()
        with HostTileStore(n, np.float32, path=p) as st2:
            np.testing.assert_array_equal(st2.array, first)


class TestOutOfCore:
    @pytest.mark.parametrize("n,panel,nb", [(128, 32, 16), (256, 64, 32)])
    def test_matches_lapack(self, n, panel, nb):
        from dla_tpu.algos.oocore import potrf_outofcore

        with HostTileStore(n, np.float64) as st:
            st.fill_plgsy(seed=51)
            a = np.tril(st.array).copy()
            a_sym = a + np.tril(a, -1).T
            potrf_outofcore(st, panel=panel, nb=nb)
            got = np.tril(st.array)
        ref = scipy.linalg.cholesky(a_sym, lower=True)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)

    def test_distributed_mesh_matches_lapack(self):
        """Distributed out-of-core (ROADMAP #7 / BASELINE config 5 at
        multi-chip scale): streamed panels row-sharded over the full device
        mesh, update GEMMs SPMD with XLA-inserted collectives. Must meet the
        same fp64 gate as the single-device path."""
        from dla_tpu.algos.oocore import potrf_outofcore
        from dla_tpu.parallel import make_mesh

        n, panel, nb = 256, 64, 32
        mesh = make_mesh(2, 4)
        with HostTileStore(n, np.float64) as st:
            st.fill_plgsy(seed=51)
            a = np.tril(st.array).copy()
            a_sym = a + np.tril(a, -1).T
            stats = potrf_outofcore(st, panel=panel, nb=nb, mesh=mesh)
            got = np.tril(st.array)
        ref = scipy.linalg.cholesky(a_sym, lower=True)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)
        assert stats["panels"] == n // panel

    def test_distributed_mesh_rejects_bad_panel(self):
        from dla_tpu.algos.oocore import potrf_outofcore
        from dla_tpu.parallel import make_mesh

        with HostTileStore(64, np.float64) as st:
            st.fill_plgsy(seed=51)
            with pytest.raises(ValueError, match="multiple of mesh.size"):
                potrf_outofcore(st, panel=4, nb=4, mesh=make_mesh(2, 4))

    def test_freivalds_gate_end_to_end(self):
        from dla_tpu.algos.oocore import potrf_outofcore

        n = 256
        with HostTileStore(n, np.float64) as st, HostTileStore(n, np.float64) as orig:
            st.fill_plgsy(seed=51)
            orig.array[:] = np.tril(st.array)
            potrf_outofcore(st, panel=64, nb=32)
            res = orig.freivalds_residual(st)
        assert res < 1e-10, res

    def test_torn_writeback_recovers_from_scratch(self, tmp_path):
        """Crash DURING the store writeback of a factored panel (after the
        scratch-stage, mid-unpack): the store holds a torn panel, but resume
        must replay the commit from the durable scratch file (ADVICE r1:
        the old sidecar recorded completion only after unpack, so this
        window silently corrupted the factor)."""
        from dla_tpu.algos.oocore import potrf_outofcore

        n, panel, nb = 128, 32, 16
        mat = str(tmp_path / "mat.bin")
        prog = str(tmp_path / "progress.json")

        class Torn(Exception):
            pass

        with HostTileStore(n, np.float64, path=mat) as st:
            st.fill_plgsy(seed=51)
            a_sym = np.tril(st.array) + np.tril(st.array, -1).T

            real_unpack = st.unpack
            calls = []

            def torn_unpack(i0, j0, src):
                calls.append(i0)
                if len(calls) == 2:  # panel j=1: tear the write, then die
                    real_unpack(i0, j0, np.full_like(src, np.nan))
                    raise Torn
                return real_unpack(i0, j0, src)

            st.unpack = torn_unpack
            with pytest.raises(Torn):
                potrf_outofcore(st, panel=panel, nb=nb, progress_path=prog)

        with HostTileStore(n, np.float64, path=mat) as st2:
            assert np.isnan(st2.array[panel:, panel : 2 * panel]).any()
            potrf_outofcore(st2, panel=panel, nb=nb, progress_path=prog)
            got = np.tril(st2.array)
        ref = scipy.linalg.cholesky(a_sym, lower=True)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)

    @pytest.mark.parametrize("ram_cache", [False, True])
    def test_panel_store_matches_lapack(self, tmp_path, ram_cache):
        """The O_DIRECT panel-blocked store (the at-scale disk backend)
        through the same out-of-core algorithm, validated by the streaming
        Freivalds pass and against LAPACK. ram_cache=True is the
        write-through RAM cache (reads from memory, writes to disk)."""
        from dla_tpu.algos.oocore import potrf_outofcore

        n, panel = 1536, 512  # f64: 512 * 8 B rows = one 4096 B sector
        p = str(tmp_path / "panels.bin")
        with DirectPanelStore(
            n, np.float64, path=p, panel=panel, ram_cache=ram_cache
        ) as st:
            st.fill_plgsy(seed=51)
            potrf_outofcore(st, panel=panel, nb=128)
            res = freivalds_streaming(st, seed=51, probes=4)
            assert res < 1e-10, res
            lgot = np.zeros((n, n))
            for j in range(st.npan):
                j0 = j * panel
                b = st.pack(j0, j0, n - j0, panel)
                lgot[j0:, j0 : j0 + panel] = b
                st.release(b)
        with HostTileStore(n, np.float64) as ref:
            ref.fill_plgsy(seed=51)
            a_sym = np.tril(ref.array) + np.tril(ref.array, -1).T
        lref = scipy.linalg.cholesky(a_sym, lower=True)
        np.testing.assert_allclose(np.tril(lgot), lref, rtol=1e-9, atol=1e-9)
        if ram_cache:
            # write-through property: the DISK copy (read cache-less in a
            # fresh store object) must hold the factored panels too
            with DirectPanelStore(n, np.float64, path=p, panel=panel) as st2:
                assert freivalds_streaming(st2, seed=51, probes=2) < 1e-10

    @pytest.mark.parametrize("dtype", [np.float64, np.float32])
    def test_host_blas_matches_lapack(self, dtype):
        """The in-place OpenBLAS host path (host_blas=True) — the shipping
        at-scale CPU configuration — must meet the same gates as the device
        path (fp64: 1e-10-class elementwise agreement with LAPACK)."""
        from dla_tpu.algos.oocore import potrf_outofcore

        n, panel, nb = 256, 64, 32
        with HostTileStore(n, dtype) as st:
            st.fill_plgsy(seed=51)
            a = np.tril(np.asarray(st.array, np.float64)).copy()
            a_sym = a + np.tril(a, -1).T
            potrf_outofcore(st, panel=panel, nb=nb, host_blas=True)
            got = np.tril(np.asarray(st.array, np.float64))
        ref = scipy.linalg.cholesky(a_sym, lower=True)
        tol = 1e-9 if dtype == np.float64 else 2e-4
        np.testing.assert_allclose(got, ref, rtol=tol, atol=tol)

    def test_host_blas_panel_store_resume(self, tmp_path):
        """host_blas through the O_DIRECT panel store with a sidecar:
        partial run, fresh store object, resume to completion, streaming
        Freivalds gate."""
        from dla_tpu.algos.oocore import potrf_outofcore

        n, panel = 1536, 512
        p = str(tmp_path / "panels.bin")
        prog = str(tmp_path / "progress.json")

        class Stop(Exception):
            pass

        def bomb(j, npan):
            if j == 1:
                raise Stop

        with DirectPanelStore(n, np.float64, path=p, panel=panel) as st:
            st.fill_plgsy(seed=51)
            with pytest.raises(Stop):
                potrf_outofcore(st, panel=panel, nb=128, host_blas=True,
                                progress_path=prog, on_panel=bomb)
        with DirectPanelStore(n, np.float64, path=p, panel=panel,
                              ram_cache=True) as st:
            stats = potrf_outofcore(st, panel=panel, nb=128, host_blas=True,
                                    progress_path=prog)
            assert stats["panels"] == n // panel - 2
            assert freivalds_streaming(st, seed=51, probes=4) < 1e-10

    def test_host_blas_rejects_mesh_and_bucket(self):
        from dla_tpu.algos.oocore import potrf_outofcore

        with HostTileStore(64, np.float64) as st:
            st.fill_plgsy(seed=51)
            with pytest.raises(ValueError, match="host_blas"):
                potrf_outofcore(st, panel=32, nb=16, host_blas=True,
                                height_bucket=64)

    def test_panel_store_height_bucket(self, tmp_path):
        """height_bucket pads streamed panels to a fixed shape grid (fewer
        jit shapes); padded rows must be inert and the factor exact."""
        from dla_tpu.algos.oocore import potrf_outofcore

        n, panel = 1536, 512
        p = str(tmp_path / "panels.bin")
        with DirectPanelStore(
            n, np.float64, path=p, panel=panel, ram_cache=True
        ) as st:
            st.fill_plgsy(seed=51)
            potrf_outofcore(st, panel=panel, nb=128, height_bucket=1024)
            assert freivalds_streaming(st, seed=51, probes=4) < 1e-10

    def test_panel_store_buffered_fallback(self, tmp_path):
        """direct=False (buffered I/O, e.g. for filesystems without
        O_DIRECT) permits unaligned tiny panels and stays correct."""
        from dla_tpu.algos.oocore import potrf_outofcore

        n, panel = 128, 32
        p = str(tmp_path / "panels.bin")
        with DirectPanelStore(
            n, np.float64, path=p, panel=panel, direct=False
        ) as st:
            st.fill_plgsy(seed=7)
            potrf_outofcore(st, panel=panel, nb=16)
            assert freivalds_streaming(st, seed=7, probes=2) < 1e-10

    def test_panel_store_rejects_unaligned_direct(self, tmp_path):
        with pytest.raises(ValueError, match="multiple of 4096"):
            DirectPanelStore(
                128, np.float64, path=str(tmp_path / "x.bin"), panel=32
            )

    def test_panel_store_access_pattern_guard(self, tmp_path):
        st = DirectPanelStore(
            1024, np.float64, path=str(tmp_path / "p.bin"), panel=512
        )
        with pytest.raises(ValueError, match="row-suffixes"):
            st.pack(0, 0, 512, 512)  # not a row-suffix (h != n - i0)
        with pytest.raises(ValueError, match="panel-aligned"):
            st.pack(0, 100, 1024, 512)
        st.close()

    def test_streaming_freivalds_matches_dense(self, tmp_path):
        """The numpy probe generator must reproduce the native runtime's
        probe_x hash: an identically corrupted factor must produce the same
        residual through the dense (C++) and streaming (panel-store) paths."""
        n, panel = 128, 32
        with HostTileStore(n, np.float64) as sa:
            sa.fill_plgsy(seed=51)
            a_sym = np.tril(sa.array) + np.tril(sa.array, -1).T
            l = scipy.linalg.cholesky(a_sym, lower=True)
            l[5, 3] += 1e-3  # a deliberate defect both paths must price alike
            with HostTileStore(n, np.float64) as sl:
                sa.array[:] = np.tril(a_sym)
                sl.array[:] = l
                dense = sa.freivalds_residual(sl, probes=3)
        with DirectPanelStore(
            n, np.float64, path=str(tmp_path / "l.bin"), panel=panel,
            direct=False,
        ) as st:
            for j in range(st.npan):
                j0 = j * panel
                st.unpack(j0, j0, np.ascontiguousarray(l[j0:, j0 : j0 + panel]))
            streaming = freivalds_streaming(st, seed=51, probes=3)
        assert dense > 1e-7  # the defect is visible
        np.testing.assert_allclose(streaming, dense, rtol=1e-10)

    def test_panel_store_distributed_mesh(self, tmp_path):
        """The full BASELINE config-5 shape: disk-backed O_DIRECT panel
        store + panels row-sharded over the device mesh (distributed
        out-of-core), to the fp64 gate."""
        from dla_tpu.algos.oocore import potrf_outofcore
        from dla_tpu.parallel import make_mesh

        n, panel = 1536, 512
        mesh = make_mesh(2, 4)
        p = str(tmp_path / "panels.bin")
        with DirectPanelStore(n, np.float64, path=p, panel=panel) as st:
            st.fill_plgsy(seed=51)
            stats = potrf_outofcore(st, panel=panel, nb=128, mesh=mesh)
            assert stats["panels"] == n // panel
            assert freivalds_streaming(st, seed=51, probes=4) < 1e-10

    def test_panel_store_torn_writeback_recovers(self, tmp_path):
        """Torn final write on the panel store: the scratch REGION (not a
        .npy file — buffered page-cache writes crawl on this VM) replays the
        commit on resume."""
        from dla_tpu.algos.oocore import potrf_outofcore

        n, panel = 128, 32
        mat = str(tmp_path / "p.bin")
        prog = str(tmp_path / "progress.json")

        class Torn(Exception):
            pass

        with DirectPanelStore(
            n, np.float64, path=mat, panel=panel, direct=False
        ) as st:
            st.fill_plgsy(seed=51)
            real_unpack = st.unpack
            calls = []

            def torn_unpack(i0, j0, src):
                calls.append(i0)
                if len(calls) == 2:  # panel j=1: tear the write, then die
                    real_unpack(i0, j0, np.full_like(src, np.nan))
                    raise Torn
                return real_unpack(i0, j0, src)

            st.unpack = torn_unpack
            with pytest.raises(Torn):
                potrf_outofcore(st, panel=panel, nb=16, progress_path=prog)

        with DirectPanelStore(
            n, np.float64, path=mat, panel=panel, direct=False
        ) as st2:
            b = st2.pack(panel, panel, n - panel, panel)
            assert np.isnan(b).any()  # the tear is on disk
            st2.release(b)
            potrf_outofcore(st2, panel=panel, nb=16, progress_path=prog)
            assert freivalds_streaming(st2, seed=51, probes=2) < 1e-10

    def test_checkpoint_resume(self, tmp_path):
        """Kill-and-resume: factor the first panels, 'crash', resume from
        the progress sidecar, end with a correct factor."""
        from dla_tpu.algos.oocore import potrf_outofcore

        n, panel, nb = 128, 32, 16
        mat = str(tmp_path / "mat.bin")
        prog = str(tmp_path / "progress.json")
        with HostTileStore(n, np.float64, path=mat) as st:
            st.fill_plgsy(seed=51)
            a_sym = np.tril(st.array) + np.tril(st.array, -1).T

            class Crash(Exception):
                pass

            def crash_after_two(j, npan):
                if j == 1:
                    raise Crash

            with pytest.raises(Crash):
                potrf_outofcore(
                    st, panel=panel, nb=nb, progress_path=prog, on_panel=crash_after_two
                )
        # resume in a fresh store (fresh process analogue)
        with HostTileStore(n, np.float64, path=mat) as st2:
            potrf_outofcore(st2, panel=panel, nb=nb, progress_path=prog)
            got = np.tril(st2.array)
        ref = scipy.linalg.cholesky(a_sym, lower=True)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)
