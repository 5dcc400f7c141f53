"""Profiling & roofline accounting.

The reference's profiling is wall-clock ``clock_gettime`` around the
factorization + model flop counts (``v6_test.c:54-60``), plus StarPU
performance-model calibration managed by the harness (repeat 0 with
``STARPU_CALIBRATE=1``, ``benchmark.c:201``) — SURVEY §5.1. The TPU
equivalents here:

- :func:`time_fn` — compile-once-then-median timing with a forced
  device→host readback (``block_until_ready`` alone does not reliably wait
  on remote-TPU paths); the warm-up call is the calibration analogue.
- :class:`Roofline` — per-op model-flops vs hardware-peak fractions
  (replaces scheduler calibration: the schedule is static, only peak
  fraction matters).
- :func:`trace` — a ``jax.profiler`` trace context for deep dives
  (tensorboard-viewable), replacing StarPU's worker stats.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import time
from typing import Callable, Sequence


def device_peak_gflops(dtype: str = "float32", precision: str | None = None) -> float:
    """Per-chip MXU peak for roofline fractions. Overridable via
    DLA_TPU_PEAK_GFLOPS. Defaults: TPU v5e ≈ 197 TFLOP/s bf16 nominal;
    fp32 ceilings MEASURED via a chained-GEMM probe
    (results/micro2_r2.jsonl, RTT-corrected): 'default' 1-pass ≈ 182,
    'high' bf16x3 3-pass ≈ 63, 'highest' true-fp32 6-pass ≈ 31 TF/s — the
    reference's "fp32-effective peak ~65.7" corresponds to the 3-pass
    tier, not to 'highest' (VERDICT r1 premise corrected)."""
    env = os.environ.get("DLA_TPU_PEAK_GFLOPS")
    if env:
        return float(env)
    bf16 = 197e3
    if dtype in ("bfloat16", "float16"):
        return bf16
    if dtype == "float32":
        prec = precision or os.environ.get("DLA_TPU_MATMUL_PRECISION", "highest")
        return {"default": 1.82e5, "fastest": 1.82e5, "high": 6.31e4}.get(
            prec, 3.14e4
        )
    return bf16 / 8.0  # emulated wide types


def force_result(x) -> None:
    """Force completion of a device computation via a scalar readback."""
    import numpy as np

    arr = x
    if isinstance(x, (tuple, list)):
        arr = x[0]
    np.asarray(arr.ravel()[-1])


def time_fn(
    fn: Callable,
    *args,
    iters: int = 3,
    warmup: int = 1,
    force: Callable = force_result,
) -> tuple[float, Sequence[float]]:
    """Median wall time of ``fn(*args)`` with forced completion.
    Returns (median_seconds, all_times)."""
    for _ in range(warmup):
        force(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force(fn(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2], times


@dataclasses.dataclass
class RooflineEntry:
    name: str
    flops: float
    seconds: float
    gflops: float
    peak_fraction: float


class Roofline:
    """Accumulates per-op (name, model-flops, seconds) and reports GFLOP/s
    and fraction-of-peak — the per-kernel accounting the rebuild uses in
    place of StarPU's calibrated performance models."""

    def __init__(self, dtype: str = "float32", peak_gflops: float | None = None):
        self.peak = peak_gflops or device_peak_gflops(dtype)
        self.entries: list[RooflineEntry] = []

    def record(self, name: str, flops: float, seconds: float) -> RooflineEntry:
        g = flops / seconds / 1e9
        e = RooflineEntry(name, flops, seconds, g, g / self.peak)
        self.entries.append(e)
        return e

    def report(self) -> str:
        lines = [f"{'op':24s} {'GFLOP/s':>12s} {'%peak':>8s} {'time':>10s}"]
        for e in self.entries:
            lines.append(
                f"{e.name:24s} {e.gflops:12.1f} {e.peak_fraction * 100:7.1f}% "
                f"{e.seconds * 1e3:9.2f}ms"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
