"""Serving at the north-star size: N=65536 from the resident bf16 factor.

Completes the serving characterization (``solve_serving_sweep.jsonl``,
``solve_latency_probe.jsonl``) at the BASELINE north-star N: the bf16
storage policy is the only way N=65536 fits in-core (8.6 GiB matrix;
fp32 needs ≥2·N² = 34 GiB > HBM), and ``potrs`` solves from a bf16
factor by upcasting operand slices block-locally (solve.py) — so the
whole factor-once-serve-many loop runs on-chip at the size the
reference's distributed design existed to reach.

The explicit-inverse fast path is structurally excluded here: A⁻¹ in
f32 is 17.2 GiB > HBM (and a bf16 inverse would square the κ·eps
error), so ``potrs`` IS the serving path at this size.

Accuracy framing: the raw forward error from a bf16 factor is
bf16-grade (reported, informational gate 1e-2); the ≤1e-10 contract at
this exact config is `posv_refined_streamed`'s, already held at
1.81e-15 in 3 iterations (docs/STATUS_r3.md, bf16 N=65536 artifact).
Flops at the LAPACK 2·N²·NRHS convention; chained-timing convention as
the sweep. ib=1024 halves the unrolled program's step count at this N
(256 → 128 GEMM steps; the 16384-scale probe measured 512 vs 1024
within 0.6%).

Run (detached — CLAUDE.md compile-service rules):
    setsid nohup python benchmarks/solve_serving_n65536.py \
        > benchmarks/results_r3/solve_serving_n65536.log 2>&1 &
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

N = 65536
NB = 4096
IB = 1024
CHAIN = int(os.environ.get("SOLVE_CHAIN", 8))
WIDTHS = (256, 1024)
CHUNK = 2048
OUT = os.path.join(REPO, "benchmarks/results_r3/solve_serving_n65536.jsonl")


def log(*a):
    print(*a, flush=True)


def gen_bf16(n: int) -> jax.Array:
    """Seeded SPD + N·I in bf16 without an fp32 N² intermediate —
    (chunk, n) fp32 slabs cast per slab (bench.py's chunked generator)."""
    from dla_tpu.ops.lapack_like import plgsy_tile

    def body(i, out):
        r0 = i * CHUNK
        tile = plgsy_tile(51, r0, 0, CHUNK, n,
                          bump=float(n), dtype=jnp.float32)
        return lax.dynamic_update_slice(out, tile.astype(jnp.bfloat16),
                                        (r0, 0))

    return lax.fori_loop(0, n // CHUNK, body,
                         jnp.zeros((n, n), jnp.bfloat16))


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dla_tpu.algos import potrf_inplace
    from dla_tpu.algos.solve import potrs

    log(f"backend={jax.default_backend()} N={N} chain={CHAIN} ib={IB}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup (first-contact): {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    a = jax.jit(gen_bf16, static_argnums=0)(N)
    _ = float(a[0, 0].astype(jnp.float32))
    log(f"gen bf16 (8.6 GiB): {time.perf_counter() - t0:.1f}s")

    # bench.py's bf16-tier config: nb=kb=4096, tb=1024 (tb=4096 overflows
    # the 128M VMEM budget: 2-deep-buffered bf16[4096,4096] windows)
    fact = jax.jit(
        lambda x: potrf_inplace(x, nb=NB, tb=1024, kb=NB,
                                precision="default"),
        donate_argnums=0,
    )
    t0 = time.perf_counter()
    l = fact(a)  # donates a
    _ = float(l[N - 1, N - 1].astype(jnp.float32))
    log(f"factor compile+run: {time.perf_counter() - t0:.1f}s")

    for nrhs in WIDTHS:
        b0 = jax.random.normal(jax.random.PRNGKey(0), (N, nrhs), jnp.float32)

        def chain(l, b0):
            def body(_i, x):
                return potrs(l, b0 + jnp.float32(1e-20) * x, ib=IB)

            return lax.fori_loop(0, CHAIN, body,
                                 jnp.zeros(b0.shape, jnp.float32))

        cf = jax.jit(chain)
        t0 = time.perf_counter()
        xc = cf(l, b0)
        _ = float(xc[N - 1, nrhs - 1])
        log(f"[nrhs={nrhs}] chain compile+warm: "
            f"{time.perf_counter() - t0:.1f}s")
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            xc = cf(l, b0)
            _ = float(xc[N - 1, nrhs - 1])
            times.append(time.perf_counter() - t0)
        per = sorted(times)[1] / CHAIN
        row = {
            "path": "potrs_bf16_factor", "n": N, "nrhs": nrhs, "ib": IB,
            "per_solve_s": round(per, 5),
            "gflops": round(2.0 * N * N * nrhs / per / 1e9, 1),
            "rhs_cols_per_s": round(nrhs / per, 1),
            "factor_read_gbs": round(2.0 * N * N / per / 1e9, 1),  # bf16
        }
        if nrhs == WIDTHS[-1]:
            # chunked forward-error check: slabs of A regenerated in fp32
            # (never a full fp32 A), dots pinned highest (r1 lesson)
            from dla_tpu.ops.lapack_like import plgsy_tile

            def check(x, b):
                def body(i, carry):
                    rmax, namax = carry
                    r0 = i * CHUNK
                    # check against the matrix the factor actually saw
                    # (bf16-rounded Â): isolates solve error from the
                    # ~eps_bf16 storage rounding, which is the factor
                    # artifact's story
                    tile = plgsy_tile(51, r0, 0, CHUNK, N,
                                      bump=float(N), dtype=jnp.float32
                                      ).astype(jnp.bfloat16
                                               ).astype(jnp.float32)
                    rr = jnp.matmul(tile, x, precision="highest") \
                        - lax.dynamic_slice(b, (r0, 0), (CHUNK, nrhs))
                    return (jnp.maximum(rmax, jnp.max(jnp.abs(rr))),
                            jnp.maximum(namax,
                                        jnp.max(jnp.sum(jnp.abs(tile), 1))))

                rmax, namax = lax.fori_loop(
                    0, N // CHUNK, body,
                    (jnp.float32(0.0), jnp.float32(0.0)))
                return rmax / (namax * jnp.max(jnp.abs(x)))

            res = float(jax.jit(check)(xc, b0))
            gate = 1e-2  # bf16-grade informational gate; 1e-10 is refined's
            row["residual"] = res
            log(f"[nrhs={nrhs}] ||AX-B|| scaled = {res:.2e} "
                f"{'PASS' if res < gate else 'FAIL'} (informational gate "
                f"{gate}; <=1e-10 is posv_refined_streamed's, held at "
                f"1.81e-15)")
        log(json.dumps(row))
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        del b0, xc

    log("done")


if __name__ == "__main__":
    main()
