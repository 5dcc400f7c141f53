"""Headline benchmark: single-chip tiled POTRF GFLOP/s on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GFLOP/s", "vs_baseline": N}

Baseline: the reference's repo-best 204.8 GFLOP/s — fp64 DPOTRF at N=16000,
NB=448, hybrid 3CPU+1GPU via Chameleon/StarPU (BASELINE.md; bench.csv).
GFLOP/s accounting matches the reference exactly: (1/3)·N³ / t
(``v6_test.c:60`` — no lower-order terms).

Diagnostics (residual, invariants, per-iter times) go to stderr; stdout is
the single JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

BASELINE_GFLOPS = 204.8  # reference repo-best (BASELINE.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("BENCH_N", 28672))
    nb = int(os.environ.get("BENCH_NB", 4096))
    iters = int(os.environ.get("BENCH_ITERS", 3))
    panel = os.environ.get("BENCH_PANEL", "invgemm")
    trailing = os.environ.get("BENCH_TRAILING", "pallas")

    # Matmul precision for the bench: measured on v5e that 'default' gives
    # identical residual to 'highest' on this code path (the panel solves are
    # lax.linalg ops unaffected by the knob; the Pallas trailing kernel keeps
    # fp32 accumulation) and ~10% more throughput. The residual is reported
    # in the JSON line either way. Library default elsewhere stays 'highest'.
    os.environ.setdefault("DLA_TPU_MATMUL_PRECISION", "default")

    import jax

    # Persistent compilation cache: the remote-TPU compile service is slow
    # for large programs; cache hits make repeat bench runs start instantly.
    cache_dir = os.environ.get("BENCH_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from dla_tpu.algos import potrf_shrink
    from dla_tpu.ops import plgsy
    from dla_tpu.validate import residual_potrf

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    log(f"N={n} NB={nb} dtype=float32 iters={iters} panel={panel} trailing={trailing}")

    dtype = jnp.float32

    idx = jnp.arange(n)

    def step(s):
        # generate + factor under one jit; the per-iteration bump
        # perturbation keeps any execution-level caching honest. Generation
        # is O(N²) elementwise — noise next to the O(N³/3) factorization.
        a = plgsy(n, bump=float(n), seed=51, dtype=dtype)
        a = a.at[idx, idx].add(s)  # diagonal perturbation, no N² temp
        return potrf_shrink(a, nb=nb, panel=panel, trailing=trailing)

    fn = jax.jit(step)

    t0 = time.perf_counter()
    l = fn(jnp.float32(0.0))
    # force through a device->host readback (block_until_ready alone does
    # not reliably wait on this remote-TPU path)
    _ = float(l[0, 0])
    t1 = time.perf_counter()
    log(f"compile+first run: {t1 - t0:.1f}s")

    times = []
    for i in range(iters):
        s = jnp.float32((i + 1) * 1e-3)
        t0 = time.perf_counter()
        l = fn(s)
        _ = float(l[n - 1, n - 1])  # readback forces completion
        t1 = time.perf_counter()
        times.append(t1 - t0)
        log(f"iter {i}: {t1 - t0:.4f}s -> {(n**3 / 3) / (t1 - t0) / 1e9:.1f} GFLOP/s")

    t = sorted(times)[len(times) // 2]  # median, matching plot_grid_all.py
    gflops = (n**3 / 3) / t / 1e9

    @jax.jit
    def check(l, s):
        a = plgsy(n, bump=float(n), seed=51, dtype=dtype)
        a = a.at[idx, idx].add(s)
        return residual_potrf(a, l)

    res = float(check(l, jnp.float32(iters * 1e-3)))
    log(f"Performance: {gflops:.2f} Gflop/s")
    log(f"||A - LL^T||_inf / ||A||_inf = {res:.2e}")

    print(
        json.dumps(
            {
                "metric": f"POTRF fp32 N={n} NB={nb} single-chip",
                "value": round(gflops, 1),
                "unit": "GFLOP/s",
                "vs_baseline": round(gflops / BASELINE_GFLOPS, 2),
                "residual": res,
            }
        )
    )


if __name__ == "__main__":
    main()
