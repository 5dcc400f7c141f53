"""Solve-path (serving) characterization sweep on the real chip — r3 s8.

Extends ``solve_serving_r3.py``'s single point into a curve: RHS-block
width NRHS ∈ {128..4096} at N=16384 plus a N=32768 point, all from a
resident `high`-tier factor. The reference times only the factorization
(``v6_test.c:54-57``); this characterizes the other half of the config-3
"full solve" capability (BASELINE.json) as a *serving* roofline:

- the blocked solve (:func:`dla_tpu.algos.solve.potrs`) is a sequential
  chain of n/ib block steps whose GEMMs are (ib×off)·(off×NRHS) — at
  small NRHS each step is latency/launch-bound, so throughput should
  rise with NRHS until the MXU tiles saturate;
- flops are counted at the LAPACK convention 2·N²·NRHS (two triangular
  solves at N²/2·NRHS MACs each — the blocked GEMMs touch only the
  triangle). NOTE: supersedes ``solve_serving.json``'s 4·N²·NRHS
  overcount; the columns/s metric there was and is convention-free.
- timing is the bench.py chained convention: CHAIN dependent solves in
  one on-device fori_loop (b_i = b0 + 1e-20·x_{i-1} forces sequencing),
  median of 3, RTT amortized across the chain.

Run (detached — CLAUDE.md compile-service rules):
    setsid nohup python benchmarks/solve_serving_sweep.py \
        > benchmarks/results_r3/solve_serving_sweep.log 2>&1 &
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

CHAIN = int(os.environ.get("SOLVE_CHAIN", 16))
NB = int(os.environ.get("SOLVE_NB", 1024))
CONFIGS = [
    # (N, [NRHS...], validate_at)
    (16384, [128, 512, 1024, 2048, 4096], 1024),
    (32768, [1024, 4096], 1024),
]
OUT = os.path.join(REPO, "benchmarks/results_r3/solve_serving_sweep.jsonl")


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

    log(f"backend={jax.default_backend()} chain={CHAIN} nb={NB}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup (first-contact): {time.perf_counter() - t0:.1f}s")

    def check(a, x, b):
        # validation matmul pinned highest (r1: validator self-pollution)
        r = jnp.matmul(a, x, precision="highest") - b
        na = jnp.max(jnp.sum(jnp.abs(a), axis=1))
        return (jnp.max(jnp.abs(r)) / (na * jnp.max(jnp.abs(x)))).astype(
            jnp.float32
        )

    rows = []
    for n, widths, val_at in CONFIGS:
        gen = jax.jit(lambda n=n: plgsy(n, seed=7, dtype=jnp.float32))
        a = gen()
        _ = float(a[0, 0])
        fact = jax.jit(
            lambda x: potrf_inplace(x, nb=NB, tb=NB, kb=NB, precision="high")
        )
        t0 = time.perf_counter()
        l = fact(a)
        _ = float(l[n - 1, n - 1])
        log(f"[N={n}] factor compile+run: {time.perf_counter() - t0:.1f}s")
        del a  # HBM headroom at N=32768 (factor + a + rhs + chain x)

        for nrhs in widths:
            b0 = jax.random.normal(
                jax.random.PRNGKey(0), (n, nrhs), jnp.float32
            )

            def chain(l, b0):
                def body(_i, x):
                    return potrs(l, b0 + jnp.float32(1e-20) * x)

                return lax.fori_loop(0, CHAIN, body, jnp.zeros_like(b0))

            cf = jax.jit(chain)
            t0 = time.perf_counter()
            xc = cf(l, b0)
            _ = float(xc[n - 1, nrhs - 1])
            log(f"[N={n} NRHS={nrhs}] chain compile+warm: "
                f"{time.perf_counter() - t0:.1f}s")
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                xc = cf(l, b0)
                _ = float(xc[n - 1, nrhs - 1])
                times.append(time.perf_counter() - t0)
            per = sorted(times)[1] / CHAIN
            flops = 2.0 * n * n * nrhs  # LAPACK POTRS convention
            row = {
                "n": n, "nrhs": nrhs, "chain": CHAIN, "precision": "high",
                "per_solve_s": round(per, 5),
                "gflops": round(flops / per / 1e9, 1),
                "rhs_cols_per_s": round(nrhs / per, 1),
                "factor_read_gbs": round(4.0 * n * n / per / 1e9, 1),
            }
            res = None
            if nrhs == val_at:
                x1 = jax.jit(potrs)(l, b0)
                a2 = gen()
                res = float(jax.jit(check)(a2, x1, b0))
                del a2, x1
                gate = 1e-4
                row["residual"] = res
                log(f"[N={n} NRHS={nrhs}] ||AX-B|| scaled = {res:.2e} "
                    f"{'PASS' if res < gate else 'FAIL'} (gate {gate})")
            log(json.dumps(row))
            rows.append(row)
            with open(OUT, "a") as f:
                f.write(json.dumps(row) + "\n")
            del b0, xc
        del l

    log(f"done: {len(rows)} rows -> {OUT}")


if __name__ == "__main__":
    main()
