import csv
import json
import os
import subprocess
import sys

import pytest

from dla_tpu.bench.harness import SweepConfig, parse_metrics, run_sweep
from dla_tpu.cli.session import dag_counts
from dla_tpu.utils.config import RunConfig
from dla_tpu.utils.flops import (
    gemm_tile_flops,
    potrf_flops,
    syrk_tile_flops,
    trsm_tile_flops,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # skip the axon TPU plugin registration in CPU-only child processes
    # (it is flaky/slow over the tunnel and irrelevant for these tests)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _run(cmd, **kw):
    kw.setdefault("env", _env())
    return subprocess.run(
        cmd, capture_output=True, text=True, timeout=600, **kw
    )


class TestConfig:
    def test_dtype_aliases(self):
        assert RunConfig(n=8, nb=4, dtype="d").dtype == "float64"
        assert RunConfig(n=8, nb=4, dtype="s").dtype == "float32"
        assert RunConfig(n=8, nb=4, dtype="z").dtype == "complex128"
        assert RunConfig(n=8, nb=4, dtype="c").dtype == "complex64"
        with pytest.raises(ValueError):
            RunConfig(n=8, nb=4, dtype="q")  # not in the reference map

    def test_layering_env_over_json(self, tmp_path):
        prof = tmp_path / "appsettings.json"
        prof.write_text(json.dumps({"n": 100, "nb": 10, "seed": 1}))
        cfg = RunConfig.layered(
            json_path=str(prof), env={"CHOLESKY_N": "64"}, nb=16
        )
        assert cfg.n == 64  # env beats JSON
        assert cfg.nb == 16  # flag beats JSON
        assert cfg.seed == 1  # JSON fills the rest

    def test_validation(self):
        with pytest.raises(ValueError):
            RunConfig(n=-1, nb=4)
        assert RunConfig(n=8, nb=4, uplo="U").uplo == "U"
        assert RunConfig(n=8, nb=4, uplo="b").uplo == "B"  # both (r3)
        with pytest.raises(ValueError):
            RunConfig(n=8, nb=4, uplo="X")


class TestFlops:
    def test_counts(self):
        assert potrf_flops(12) == 12**3 / 3
        assert trsm_tile_flops(4) == 64  # corrected: B^3, not 0.5*B^3
        assert syrk_tile_flops(4) == 64
        assert gemm_tile_flops(4) == 128


class TestDagCounts:
    def test_reference_demo_size(self):
        """The reference's N=12,B=4 demo is 3x3 tiles -> 10 tasks
        (client wave loop, client_distrib.cpp:506-565: 3 POTRF + 3 TRSM +
        3 SYRK + 1 GEMM)."""
        c = dag_counts(3)
        assert c == {"POTRF": 3, "TRSM": 3, "SYRK": 3, "GEMM": 1, "total": 10}

    @pytest.mark.parametrize("nt", [1, 2, 3, 5, 8])
    def test_matches_enumeration(self, nt):
        potrf = trsm = syrk = gemm = 0
        for k in range(nt):
            potrf += 1
            for i in range(k + 1, nt):
                trsm += 1
                for j in range(k + 1, i + 1):
                    if i == j:
                        syrk += 1
                    else:
                        gemm += 1
        c = dag_counts(nt)
        assert (c["POTRF"], c["TRSM"], c["SYRK"], c["GEMM"]) == (
            potrf,
            trsm,
            syrk,
            gemm,
        )


class TestParseMetrics:
    def test_parse(self):
        out = (
            "[dla-potrf] blah\nElapsed: 12.3 ms\n"
            "Performance: 123.45 Gflop/s\n"
            "||A - LL^T||_inf / ||A||_inf = 5.46e-16\nPASS\n"
        )
        gf, res, ms = parse_metrics(out)
        assert gf == 123.45 and res == 5.46e-16 and ms == 12.3

    def test_parse_freivalds_fallback(self):
        # frontier configs validate matrix-free; the freivalds residual
        # must fill rel_error when the exact-reconstruction line is absent
        out = (
            "Elapsed: 12.3 ms\nPerformance: 123.45 Gflop/s\n"
            "freivalds ||(A - LL^T)x|| / (||A|| ||x||) = 8.96e-07\nPASS\n"
        )
        gf, res, ms = parse_metrics(out)
        assert gf == 123.45 and res == 8.96e-07 and ms == 12.3


@pytest.mark.slow
class TestDriverEndToEnd:
    def test_driver_fp64_gate(self):
        r = _run(
            [
                sys.executable,
                "-m",
                "dla_tpu.cli.potrf_driver",
                "--n",
                "256",
                "--nb",
                "64",
                "--dtype",
                "d",
                "--platform",
                "cpu",
            ]
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "Performance:" in r.stdout
        assert "PASS" in r.stdout

    def test_driver_user_input_matrix(self, tmp_path):
        """The reference's `--mat user` parity (VERDICT r3 missing #1;
        v3_script_cholesky_x_arg_gpt.c:157-196): factor a user-provided
        matrix from .npy / .npz / raw binary, cross-checked against the
        scipy oracle; shape/size/finite violations are rejected with
        rc=2 before any compute."""
        import numpy as np
        import scipy.linalg

        rng = np.random.default_rng(3)
        n = 192
        g = rng.standard_normal((n, n))
        a = ((g + g.T) / 2 + n * np.eye(n)).astype(np.float64)
        npy = tmp_path / "a.npy"
        np.save(npy, a)
        npz = tmp_path / "a.npz"
        np.savez(npz, a=a)
        raw = tmp_path / "a.bin"
        a.tofile(raw)
        base = [sys.executable, "-m", "dla_tpu.cli.potrf_driver",
                "--nb", "64", "--dtype", "d", "--platform", "cpu"]
        ref = scipy.linalg.cholesky(a, lower=True)
        refline = f"{np.abs(ref).max():.3e}"  # oracle available; gate below
        del refline
        for path, extra in [
            (npy, []),            # N adopted from the file
            (npz, ["--n", str(n)]),
            (raw, ["--n", str(n)]),
        ]:
            r = _run(base + ["--input", str(path)] + extra)
            assert r.returncode == 0, (path, r.stdout + r.stderr)
            assert "PASS" in r.stdout, (path, r.stdout)
        # oracle cross-check through the library API on the same file
        import jax

        from dla_tpu.algos import potrf

        l = np.asarray(potrf(np.load(npy), nb=64))
        np.testing.assert_allclose(np.tril(l), ref, rtol=1e-9, atol=1e-9)
        del jax

    def test_driver_df64_meets_reference_gate(self):
        """--mode df64: the emulated-fp64 accelerator path must print the
        standard residual contract line and PASS the reference's 1e-10
        fp64 gate (v6_test.c:87) — on the accelerator dtype path, not a
        CPU fallback."""
        r = _run(
            [sys.executable, "-m", "dla_tpu.cli.potrf_driver",
             "--n", "256", "--nb", "64", "--mode", "df64",
             "--platform", "cpu"]
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "Performance:" in r.stdout
        assert "||A - LL^T||_inf / ||A||_inf" in r.stdout
        assert "PASS (residual < 1e-10)" in r.stdout

    def test_driver_df64_user_input(self, tmp_path):
        import numpy as np

        n = 192
        rng = np.random.default_rng(5)
        g = rng.standard_normal((n, n))
        a = (g + g.T) / 2 + n * np.eye(n)
        p = tmp_path / "a64.npy"
        np.save(p, a)
        r = _run(
            [sys.executable, "-m", "dla_tpu.cli.potrf_driver",
             "--n", str(n), "--nb", "64", "--mode", "df64",
             "--input", str(p), "--platform", "cpu"]
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "PASS (residual < 1e-10)" in r.stdout

    def test_driver_df64_blocked_residual_branch(self):
        """Past the strip-residual ceiling (env-lowered here) the driver
        must run the BLOCK-TILED full residual — the reference's exact
        contract (v6_test.c:87) instead of the Freivalds fallback — and
        still print the standard line and PASS."""
        env = dict(_env(), DLA_TPU_DF64_STRIP_RESIDUAL_MAX="128")
        r = _run(
            [sys.executable, "-m", "dla_tpu.cli.potrf_driver",
             "--n", "256", "--nb", "64", "--mode", "df64",
             "--platform", "cpu"],
            env=env,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "||A - LL^T||_inf / ||A||_inf" in r.stdout
        assert "freivalds" not in r.stdout
        assert "PASS (residual < 1e-10)" in r.stdout

    def test_driver_df64_packed_pure(self):
        """--mode df64-packed, pure path: triangle-only df64 storage with
        device generation (no host fp64 square) must meet the 1e-10 gate
        through the standard contract lines."""
        r = _run(
            [sys.executable, "-m", "dla_tpu.cli.potrf_driver",
             "--n", "256", "--nb", "64", "--mode", "df64-packed",
             "--platform", "cpu"]
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "Performance:" in r.stdout
        assert "PASS (residual < 1e-10)" in r.stdout

    def test_driver_df64_packed_split(self):
        """--df64-split 3: segmented-program execution (the compile-wall
        route) through the driver must meet the same 1e-10 contract."""
        r = _run(
            [sys.executable, "-m", "dla_tpu.cli.potrf_driver",
             "--n", "256", "--nb", "64", "--mode", "df64-packed",
             "--df64-split", "3", "--platform", "cpu"]
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "Performance:" in r.stdout
        assert "PASS (residual < 1e-10)" in r.stdout

    def test_driver_df64_packed_record_gate(self):
        """Pure df64-packed past the unpack HBM budget (env-lowered
        here): the driver must certify DIRECTLY off the packed pair via
        the streaming packed-native df64 Freivalds (r5 — the gate that
        puts measured residuals on the record runs) and PASS."""
        env = dict(_env(), DLA_TPU_VALIDATE_HBM_BUDGET="100000")
        r = _run(
            [sys.executable, "-m", "dla_tpu.cli.potrf_driver",
             "--n", "256", "--nb", "64", "--mode", "df64-packed",
             "--platform", "cpu"],
            env=env,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "freivalds ||(A - LL^T)x|| / (||A|| ||x||)" in r.stdout
        assert "PASS (residual < 1e-10)" in r.stdout

    def test_driver_df64_packed_user_input(self, tmp_path):
        import numpy as np

        n = 192
        rng = np.random.default_rng(5)
        g = rng.standard_normal((n, n))
        a = (g + g.T) / 2 + n * np.eye(n)
        p = tmp_path / "a64p.npy"
        np.save(p, a)
        r = _run(
            [sys.executable, "-m", "dla_tpu.cli.potrf_driver",
             "--n", str(n), "--nb", "64", "--mode", "df64-packed",
             "--input", str(p), "--platform", "cpu"]
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "PASS (residual < 1e-10)" in r.stdout

    def test_driver_user_input_rejections(self, tmp_path):
        import numpy as np

        n = 64
        sq = np.eye(n)
        rect = tmp_path / "rect.npy"
        np.save(rect, np.ones((n, n + 8)))
        short = tmp_path / "short.bin"
        sq[: n // 2].tofile(short)
        nanm = tmp_path / "nan.npy"
        bad = sq.copy()
        bad[3, 3] = np.nan
        np.save(nanm, bad)
        base = [sys.executable, "-m", "dla_tpu.cli.potrf_driver",
                "--n", str(n), "--nb", "16", "--dtype", "d",
                "--platform", "cpu"]
        for path, msg in [
            (rect, "expected square"),
            (short, "elements, expected"),
            (nanm, "non-finite"),
        ]:
            r = _run(base + ["--input", str(path)])
            assert r.returncode == 2, (path, r.stdout)
            assert msg in r.stdout, (path, r.stdout)

    def test_driver_inplace_bf16(self):
        # the r3 split-precision policy surface: single-buffer formulation
        # with bfloat16 storage, √N·eps_bf16 residual gate
        r = _run(
            [
                sys.executable,
                "-m",
                "dla_tpu.cli.potrf_driver",
                "--n",
                "256",
                "--nb",
                "64",
                "--dtype",
                "h",
                "--mode",
                "inplace",
                "--diag",
                "twolevel",
                "--platform",
                "cpu",
            ]
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "Performance:" in r.stdout
        assert "PASS" in r.stdout

    def test_driver_inplace_frontier_freivalds(self):
        # in-core-frontier validation: when (A, L, Lᵀ) exceed the device
        # budget the driver validates matrix-free via device Freivalds
        # (budget forced tiny so the path runs at test scale)
        r = _run(
            [
                sys.executable,
                "-m",
                "dla_tpu.cli.potrf_driver",
                "--n",
                "256",
                "--nb",
                "64",
                "--dtype",
                "s",
                "--mode",
                "inplace",
                "--platform",
                "cpu",
            ],
            env={**_env(), "DLA_TPU_VALIDATE_HBM_BUDGET": "1000"},
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "freivalds" in r.stdout
        assert "PASS" in r.stdout

    def test_driver_distributed(self):
        r = _run(
            [
                sys.executable,
                "-m",
                "dla_tpu.cli.potrf_driver",
                "--n",
                "128",
                "--nb",
                "16",
                "--dtype",
                "d",
                "--mode",
                "distributed",
                "--p",
                "2",
                "--q",
                "2",
                "--platform",
                "cpu",
            ]
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "PASS" in r.stdout

    def test_session_cli_env_config(self):
        env = _env()
        env["CHOLESKY_N"] = "64"
        env["CHOLESKY_B"] = "16"
        r = subprocess.run(
            [
                sys.executable,
                "-m",
                "dla_tpu.cli.session",
                "--platform",
                "cpu",
                "--x64",
                "--dtype",
                "d",
            ],
            capture_output=True,
            text=True,
            env=env,
            timeout=600,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "[CLIENT] DAG:" in r.stdout
        assert "PASS" in r.stdout

    def test_sweep_harness_csv(self, tmp_path):
        csv_path = str(tmp_path / "bench.csv")
        cfg = SweepConfig(
            ns=(64,),
            nbs=(16, 32),
            dtypes=("float64",),
            repeats=2,
            platform="cpu",
            timeout_s=590,
        )
        rows = run_sweep(cfg, csv_path, echo=False)
        assert len(rows) == 4  # 2 NBs x 2 repeats
        with open(csv_path) as f:
            rows2 = list(csv.DictReader(f))
        assert len(rows2) == 4
        assert all(r["exit_code"] == "0" for r in rows2)
        assert all(r["scheduler"] == "xla-static" for r in rows2)
        # resume: re-running adds nothing
        rows3 = run_sweep(cfg, csv_path, echo=False)
        assert rows3 == []

    def test_sweep_kb_axis(self, tmp_path):
        """The late-r3 kb frontier axis: --kb flows harness → driver →
        potrf kernels; fresh CSVs carry the kb column; configs differing
        only in kb are distinct resume keys; appending to a pre-kb CSV
        keeps that file's schema."""
        csv_path = str(tmp_path / "bench_kb.csv")
        base = dict(ns=(128,), nbs=(64,), dtypes=("float64",),
                    modes=("inplace",), repeats=2, platform="cpu",
                    timeout_s=590)
        rows = run_sweep(SweepConfig(kb=64, **base), csv_path, echo=False)
        assert len(rows) == 2 and all(r["exit_code"] == 0 for r in rows)
        assert all(r["kb"] == 64 for r in rows)
        # a different kb is a different config, not a resume hit
        rows2 = run_sweep(SweepConfig(kb=32, **base), csv_path, echo=False)
        assert len(rows2) == 2
        # same kb again resumes to nothing
        assert run_sweep(SweepConfig(kb=64, **base), csv_path, echo=False) == []
        with open(csv_path) as f:
            r = csv.DictReader(f)
            assert "kb" in r.fieldnames
            assert sorted({row["kb"] for row in r}) == ["32", "64"]
        # appending to an old-schema file must not corrupt it
        old_csv = str(tmp_path / "old.csv")
        with open(old_csv, "w") as f:
            f.write("timestamp,scheduler,mapping,ncpu,ngpu,N,NB,run_idx,ms,"
                    "exit_code,gflops,rel_error,device,mesh,dtype,mode,"
                    "precision\n")
        run_sweep(SweepConfig(kb=64, **base), old_csv, echo=False)
        with open(old_csv) as f:
            rr = csv.DictReader(f)
            assert "kb" not in rr.fieldnames
            rows4 = list(rr)
        assert len(rows4) == 2
        # no stray extra column: every row parses to exactly the old header
        assert all(len(row) == 17 and None not in row for row in rows4)


class TestPlots:
    def test_plot_functions_produce_pngs(self, tmp_path):
        import csv as _csv

        from dla_tpu.bench.plots import plot_perf_grid, plot_residuals
        from dla_tpu.bench.harness import CSV_COLUMNS

        csv_path = str(tmp_path / "b.csv")
        rows = []
        for n in (64, 128):
            for nb in (16, 32):
                for rep in range(3):
                    rows.append(
                        {
                            "timestamp": "t",
                            "scheduler": "xla-static",
                            "mapping": "cpu-sim",
                            "ncpu": 0,
                            "ngpu": 0,
                            "N": n,
                            "NB": nb,
                            "run_idx": rep,
                            "ms": 1.0,
                            "exit_code": 0,
                            "gflops": n * nb / 1000 + rep,
                            "rel_error": 1e-15 * n,
                            "device": "cpu",
                            "mesh": "1x1",
                            "dtype": "float64",
                            "mode": "blocked",
                        }
                    )
        with open(csv_path, "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=CSV_COLUMNS)
            w.writeheader()
            w.writerows(rows)
        p1 = plot_perf_grid(csv_path, str(tmp_path / "grid.png"), peak_gflops=10.0)
        p2 = plot_residuals(csv_path, str(tmp_path / "res.png"))
        import os

        assert os.path.getsize(p1) > 1000
        assert os.path.getsize(p2) > 1000

    def test_plot_serving_from_jsonl(self, tmp_path):
        import json as _json
        import os

        from dla_tpu.bench.plots import plot_serving

        rows = [
            {"path": "potrs", "n": 16384, "nrhs": 128, "ib": 512,
             "per_solve_s": 5e-3, "gflops": 12000.0,
             "rhs_cols_per_s": 23000.0},
            {"path": "potrs", "n": 16384, "nrhs": 128, "ib": 2048,
             "per_solve_s": 9e-3, "gflops": 7000.0,
             "rhs_cols_per_s": 14000.0},  # filtered: non-default ib
            {"n": 16384, "nrhs": 1024, "chain": 16,  # sweep row, no path/ib
             "per_solve_s": 1.3e-2, "gflops": 41000.0,
             "rhs_cols_per_s": 76000.0},
            {"path": "inverse", "n": 16384, "nrhs": 128, "ib": 1024,
             "per_solve_s": 3e-3, "gflops": 22000.0,
             "rhs_cols_per_s": 42000.0},
        ]
        jp = str(tmp_path / "s.jsonl")
        with open(jp, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        p = plot_serving([jp], str(tmp_path / "serving.png"))
        assert os.path.getsize(p) > 1000


class TestDriverPacked:
    def test_driver_packed_pure_freivalds_and_solve(self):
        """--mode packed, generator input: the fully packed pipeline
        (no dense square) with the matrix-free Freivalds gate and the
        packed solve contract."""
        r = _run(
            [
                sys.executable, "-m", "dla_tpu.cli.potrf_driver",
                "--n", "512", "--nb", "128", "--dtype", "d", "--x64",
                "--platform", "cpu", "--mode", "packed",
                "--solve", "potrs", "--nrhs", "3",
            ]
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "freivalds" in r.stdout  # matrix-free validation path
        assert "PASS" in r.stdout
        assert "SOLVE PASS" in r.stdout

    def test_driver_packed_pallas_trailing(self):
        """--mode packed --trailing pallas: the aliased single-pass
        trailing kernel (interpret mode off-TPU) through the driver,
        same matrix-free Freivalds gate."""
        r = _run(
            [
                sys.executable, "-m", "dla_tpu.cli.potrf_driver",
                "--n", "512", "--nb", "128", "--dtype", "d", "--x64",
                "--platform", "cpu", "--mode", "packed",
                "--trailing", "pallas", "--kb", "128",
            ]
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "freivalds" in r.stdout
        assert "PASS" in r.stdout

    def test_driver_packed_nonpure_exact_residual(self):
        """Non-plgsy input falls back to unpack + the exact dense
        residual; --solve inverse exercises the packed potri path."""
        r = _run(
            [
                sys.executable, "-m", "dla_tpu.cli.potrf_driver",
                "--n", "384", "--nb", "128", "--dtype", "d", "--x64",
                "--platform", "cpu", "--mode", "packed",
                "--gen", "gershgorin", "--solve", "inverse",
            ]
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "||A - LL^T||_inf / ||A||_inf" in r.stdout
        assert "SOLVE PASS" in r.stdout

    def test_driver_packed_rejects_uplo_u(self):
        r = _run(
            [
                sys.executable, "-m", "dla_tpu.cli.potrf_driver",
                "--n", "256", "--nb", "128", "--dtype", "d", "--x64",
                "--platform", "cpu", "--mode", "packed", "--uplo", "U",
            ]
        )
        assert r.returncode == 2

    def test_driver_packed_refined_1e10(self):
        """BASELINE config-3 contract from a PACKED fp32 factor: device
        correction solves via potrs_packed, fp64 residuals streamed
        from the host generator — <=1e-10 without materializing A."""
        r = _run(
            [
                sys.executable, "-m", "dla_tpu.cli.potrf_driver",
                "--n", "1024", "--nb", "256", "--dtype", "s",
                "--platform", "cpu", "--mode", "packed",
                "--solve", "refined", "--nrhs", "2",
            ]
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "SOLVE PASS (residual < 1e-10)" in r.stdout
