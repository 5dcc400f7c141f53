import subprocess
import sys
import os

import jax.numpy as jnp
import numpy as np
import pytest

from dla_tpu.ops import plgsy
from dla_tpu.utils.profiling import Roofline, device_peak_gflops, time_fn
from dla_tpu.validate.checked import potrf_checked

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestChecked:
    def test_spd_passes(self):
        a = plgsy(128, seed=51, dtype=jnp.float64)
        err, l = potrf_checked(a, nb=32)
        err.throw()  # no error
        assert not np.any(np.isnan(np.asarray(l)))

    def test_non_spd_raises(self):
        a = plgsy(128, bump=0.0, seed=1, dtype=jnp.float64)  # indefinite
        err, _ = potrf_checked(a, nb=32)
        with pytest.raises(Exception, match="not SPD"):
            err.throw()


class TestProfiling:
    def test_time_fn_forces_completion(self):
        import jax

        f = jax.jit(lambda x: x @ x)
        x = jnp.ones((128, 128))
        med, times = time_fn(f, x, iters=3)
        assert med > 0 and len(times) == 3

    def test_roofline_report(self):
        r = Roofline(peak_gflops=100.0)
        e = r.record("gemm", flops=5e10, seconds=1.0)
        assert e.gflops == pytest.approx(50.0)
        assert e.peak_fraction == pytest.approx(0.5)
        assert "gemm" in r.report()

    def test_peak_env_override(self, monkeypatch):
        monkeypatch.setenv("DLA_TPU_PEAK_GFLOPS", "123.0")
        assert device_peak_gflops() == 123.0


@pytest.mark.slow
class TestOracleCLI:
    def test_oracle_cross_check(self):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        r = subprocess.run(
            [sys.executable, "-m", "dla_tpu.cli.oracle", "--n", "256", "--nb", "64", "--cross-check"],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "PASS (gate 1e-10)" in r.stdout or "PASS" in r.stdout
        assert "CROSS-CHECK PASS" in r.stdout

    def test_driver_solve_refined(self):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        r = subprocess.run(
            [
                sys.executable, "-m", "dla_tpu.cli.potrf_driver",
                "--n", "256", "--nb", "64", "--dtype", "d",
                "--platform", "cpu", "--solve", "refined", "--nrhs", "2",
            ],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "SOLVE PASS" in r.stdout

    def test_driver_solve_inverse(self):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        r = subprocess.run(
            [
                sys.executable, "-m", "dla_tpu.cli.potrf_driver",
                "--n", "256", "--nb", "64", "--dtype", "d", "--x64",
                "--platform", "cpu", "--solve", "inverse", "--nrhs", "2",
            ],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "SOLVE PASS" in r.stdout
