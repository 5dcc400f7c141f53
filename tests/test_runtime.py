"""Native runtime (C++ tile store) and out-of-core POTRF tests."""

import numpy as np
import pytest
import scipy.linalg

from dla_tpu.runtime.staging import HostTileStore


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
