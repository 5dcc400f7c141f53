"""Smoke test for the headline benchmark artifact machinery (bench.py).

bench.py is the driver-facing product (the end-of-round artifact is its
one JSON line), so its tier-spec grammar, per-tier-N program memos,
chained timing, and validation-path selection are gated here on CPU at
toy shapes. The reference analogue is `benchmark.c`'s contract
(SURVEY §2 row 2); the perf numbers themselves are TPU-only.
"""

from __future__ import annotations

import io
import json
import os
import runpy
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(monkeypatch, **env):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    monkeypatch.setenv("BENCH_CACHE_DIR", "/tmp/jc_bench_smoke")
    buf = io.StringIO()
    argv = sys.argv
    try:
        sys.argv = ["bench.py"]
        with redirect_stdout(buf):
            runpy.run_path(os.path.join(REPO, "bench.py"), run_name="__main__")
    finally:
        sys.argv = argv
    return json.loads(buf.getvalue())


def test_bench_contract_tiny(monkeypatch):
    out = _run_bench(
        monkeypatch,
        BENCH_N="512", BENCH_NB="128", BENCH_ITERS="1", BENCH_CHAIN="2",
        BENCH_TB="128", BENCH_KB="128", BENCH_IB="128",
        BENCH_PRECISIONS="high:inplace:128:128:512,"
                         "bf16:inplace:128:128:256,highest,"
                         "default:packed:128:128:512",
    )
    # one-JSON-line contract fields
    assert out["unit"] == "GFLOP/s"
    assert out["value"] > 0 and out["vs_baseline"] > 0
    assert "N=512" in out["metric"] and "high_inplace" in out["metric"]
    tiers = out["tiers"]
    assert set(tiers) == {"high_inplace", "bf16_default_inplace",
                          "highest", "default_packed"}
    # the packed tier validates matrix-free (Freivalds gate, fp32 scale)
    assert tiers["default_packed"]["residual"] < 1e-5
    # per-tier N threads through the spec grammar into the artifact
    assert tiers["bf16_default_inplace"]["n"] == 256
    assert tiers["highest"]["n"] == 512
    # residuals: fp32 tiers at fp32 scale, bf16 at bf16 scale
    assert tiers["high_inplace"]["residual"] < 1e-5
    assert tiers["highest"]["residual"] < 1e-5
    assert tiers["bf16_default_inplace"]["residual"] < 5e-2
    # chained and raw conventions both present
    assert out["gflops_raw"] and out["gflops_raw"] > 0


def test_bench_f64x_tier_blocked_gate(monkeypatch):
    """The r5 f64x tier: device-generated exactly-fp32 input, donated
    fresh pairs per iter, v6_test-exact residual on device (block-tiled
    past the strip ceiling — env-lowered here to exercise that branch at
    toy size) gated at the reference's 1e-10."""
    out = _run_bench(
        monkeypatch,
        BENCH_N="256", BENCH_NB="64", BENCH_ITERS="1", BENCH_CHAIN="0",
        BENCH_TB="64", BENCH_KB="64", BENCH_IB="64",
        BENCH_PRECISIONS="high:inplace:64:64:256,f64x:7:64:-:256",
        DLA_TPU_DF64_STRIP_RESIDUAL_MAX="128",
    )
    t = out["tiers"]["f64x"]
    assert t["n"] == 256 and t["nb"] == 64
    assert t["residual"] < 1e-10  # the reference's fp64 gate
    assert t["validation"] == "df64-device-blocked-residual"


def test_bench_headline_promotion(monkeypatch):
    # the headline is the library-default precision tier; with only the
    # shrink formulation present it is the plain `high` entry
    out = _run_bench(
        monkeypatch,
        BENCH_N="256", BENCH_NB="64", BENCH_ITERS="1", BENCH_CHAIN="0",
        BENCH_TB="64", BENCH_KB="64", BENCH_IB="64",
        BENCH_PRECISIONS="high",
    )
    assert "high" in out["tiers"] and out["value"] == out["tiers"]["high"]["gflops"]
