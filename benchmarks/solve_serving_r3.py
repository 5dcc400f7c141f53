"""Solve-path (serving) throughput on the real chip — r3 session 7.

The reference benchmarks the factorization only (clock_gettime around
CHAMELEON_dpotrf_Tile, ``v6_test.c:54-57``); a production *serving* story
also needs the solve side: factor once, then answer many right-hand-side
blocks from the resident factor (the BASELINE.json config-3 "full solve"
capability). This measures exactly that on the TPU:

- factor A (N=16384) once with the library-default `high` tier;
- stream K=16 dependent RHS blocks of NRHS=1024 through
  :func:`dla_tpu.algos.solve.potrs` inside one on-device ``fori_loop``
  chain (scalar-free carry: b_i = b0 + 1e-20·x_{i-1} keeps the data
  dependency so XLA cannot overlap/elide the sequential solves — the
  same RTT-amortizing convention as bench.py's chained factorizations);
- report per-solve latency and GF/s at the LAPACK convention
  2·N²·NRHS flops per solve (two triangular block solves at N²/2·NRHS
  MACs each — the blocked GEMMs touch only the triangle; the ib³
  diagonal inversions are O(N·ib²) — negligible). The first committed
  ``solve_serving.json`` used a 4·N²·NRHS overcount; its GF/s fields
  are 2× high (columns/s and latency unaffected) — superseded by
  ``solve_serving_sweep.jsonl``;
- validate one solve end-to-end: ||A·X − B||_inf / (||A||_inf·||X||_inf)
  at fp32-grade (the ≤1e-10 refined contract is posv_refined's, exercised
  in tests/test_solve.py on CPU fp64 and in the bf16 N=65536 artifact).

Run (detached — CLAUDE.md compile-service rules):
    setsid nohup python benchmarks/solve_serving_r3.py \
        > benchmarks/results_r3/solve_serving.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax import lax

N = int(os.environ.get("SOLVE_N", 16384))
NRHS = int(os.environ.get("SOLVE_NRHS", 1024))
CHAIN = int(os.environ.get("SOLVE_CHAIN", 16))
NB = int(os.environ.get("SOLVE_NB", 1024))


def log(*a):
    print(*a, flush=True)


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dla_tpu.algos import potrf_inplace
    from dla_tpu.algos.solve import potrs
    from dla_tpu.ops import plgsy

    log(f"backend={jax.default_backend()} N={N} NRHS={NRHS} chain={CHAIN}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup (first-contact): {time.perf_counter() - t0:.1f}s")

    # -- factor once (resident L) ------------------------------------------
    gen = jax.jit(lambda: plgsy(N, seed=7, dtype=jnp.float32))
    a = gen()
    _ = float(a[0, 0])
    fact = jax.jit(lambda x: potrf_inplace(x, nb=NB, tb=NB, kb=NB,
                                           precision="high"))
    t0 = time.perf_counter()
    l = fact(a)
    _ = float(l[N - 1, N - 1])
    log(f"factor compile+run: {time.perf_counter() - t0:.1f}s")

    # -- single-solve validation (raw convention, incl. RTT) ----------------
    key = jax.random.PRNGKey(0)
    b0 = jax.random.normal(key, (N, NRHS), jnp.float32)
    solve = jax.jit(potrs)
    t0 = time.perf_counter()
    x = solve(l, b0)
    _ = float(x[N - 1, NRHS - 1])
    log(f"solve compile+first run: {time.perf_counter() - t0:.1f}s")
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        x = solve(l, b0)
        _ = float(x[N - 1, NRHS - 1])
        times.append(time.perf_counter() - t0)
    t_raw = sorted(times)[1]
    flops = 2.0 * N * N * NRHS  # LAPACK POTRS convention
    log(f"single solve (raw, incl RTT): {t_raw:.4f}s -> "
        f"{flops / t_raw / 1e9:.1f} GFLOP/s")

    def check(a, x, b):
        # validation matmul pinned highest (r1 negative result: validator
        # self-pollution at bf16 default precision)
        r = jnp.matmul(a, x, precision="highest") - b
        na = jnp.max(jnp.sum(jnp.abs(a), axis=1))
        return (jnp.max(jnp.abs(r)) / (na * jnp.max(jnp.abs(x)))).astype(
            jnp.float32
        )
    a2 = gen()
    res = float(jax.jit(check)(a2, x, b0))
    gate = 1e-4  # fp32-grade forward error at N=16384 (~N·eps envelope)
    log(f"||A X - B||_inf / (||A||_inf ||X||_inf) = {res:.2e} "
        f"{'PASS' if res < gate else 'FAIL'} (gate {gate})")
    del a2

    # -- chained serving throughput -----------------------------------------
    def chain(l, b0):
        def body(_i, x):
            return potrs(l, b0 + jnp.float32(1e-20) * x)
        return lax.fori_loop(0, CHAIN, body, jnp.zeros_like(b0))

    cf = jax.jit(chain)
    t0 = time.perf_counter()
    xc = cf(l, b0)
    _ = float(xc[N - 1, NRHS - 1])
    log(f"chain compile+warm: {time.perf_counter() - t0:.1f}s")
    ctimes = []
    for _ in range(3):
        t0 = time.perf_counter()
        xc = cf(l, b0)
        _ = float(xc[N - 1, NRHS - 1])
        ctimes.append(time.perf_counter() - t0)
    t_chain = sorted(ctimes)[1]
    per = t_chain / CHAIN
    gfs = flops / per / 1e9
    log(f"chained x{CHAIN}: {per:.4f}s/solve -> {gfs:.1f} GFLOP/s")
    out = {
        "n": N, "nrhs": NRHS, "chain": CHAIN, "precision": "high",
        "per_solve_s": round(per, 5), "gflops": round(gfs, 1),
        "gflops_raw": round(flops / t_raw / 1e9, 1),
        "residual": res, "rhs_cols_per_s": round(NRHS / per, 1),
    }
    log(json.dumps(out))
    with open(os.path.join(REPO, "benchmarks/results_r3/solve_serving.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
