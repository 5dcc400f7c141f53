"""Latency-regime serving probe — r3 s8.

``solve_serving_sweep.jsonl`` showed the blocked solve is MXU-bound at
wide RHS blocks (90% of the tier ceiling) but chain/bandwidth-bound at
narrow ones (NRHS=128: 5.4 ms, factor streaming at 198 GB/s). This
probes the two levers for the narrow/latency regime at N=16384:

- ``potrs(..., ib=...)``: ib ∈ {512, 1024, 2048} halves/quarters the
  2·n/ib-step dependency chain (bigger strips → better HBM streaming);
- the explicit-inverse fast path (:func:`dla_tpu.algos.potri` one-time
  + :func:`solve_inverse` per query): one full-rate GEMM per RHS block,
  no chain at all — the classic precompute serving trade, forward error
  ~κ(A)·eps instead of backward-stable.

Chained-timing convention and LAPACK 2·N²·NRHS flops as in the sweep
(the inverse GEMM executes the same useful flop count).

Run (detached — CLAUDE.md compile-service rules):
    setsid nohup python benchmarks/solve_latency_probe.py \
        > benchmarks/results_r3/solve_latency_probe.log 2>&1 &
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
CHAIN = int(os.environ.get("SOLVE_CHAIN", 16))
NB = int(os.environ.get("SOLVE_NB", 1024))
OUT = os.path.join(REPO, "benchmarks/results_r3/solve_latency_probe.jsonl")


def log(*a):
    print(*a, flush=True)


def emit(row):
    log(json.dumps(row))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def time_chain(cf, l, b0, n, nrhs, tag):
    t0 = time.perf_counter()
    xc = cf(l, b0)
    _ = float(xc[n - 1, nrhs - 1])
    log(f"[{tag}] compile+warm: {time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        xc = cf(l, b0)
        _ = float(xc[n - 1, nrhs - 1])
        times.append(time.perf_counter() - t0)
    per = sorted(times)[1] / CHAIN
    return per, xc


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dla_tpu.algos import potrf_inplace, potri
    from dla_tpu.algos.solve import potrs
    from dla_tpu.ops import plgsy

    log(f"backend={jax.default_backend()} N={N} chain={CHAIN}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup (first-contact): {time.perf_counter() - t0:.1f}s")

    gen = jax.jit(lambda: plgsy(N, seed=7, dtype=jnp.float32))
    a = gen()
    _ = float(a[0, 0])
    fact = jax.jit(
        lambda x: potrf_inplace(x, nb=NB, tb=NB, kb=NB, precision="high")
    )
    l = fact(a)
    _ = float(l[N - 1, N - 1])
    del a
    log("factor resident")

    # ---- potrs ib probe at narrow widths --------------------------------
    for nrhs in (1, 128):
        b0 = jax.random.normal(jax.random.PRNGKey(0), (N, nrhs), jnp.float32)
        for ib in (512, 1024, 2048):

            def chain(l, b0, ib=ib):
                def body(_i, x):
                    return potrs(l, b0 + jnp.float32(1e-20) * x, ib=ib)

                return lax.fori_loop(0, CHAIN, body, jnp.zeros_like(b0))

            per, _x = time_chain(
                jax.jit(chain), l, b0, N, nrhs, f"potrs nrhs={nrhs} ib={ib}"
            )
            emit({
                "path": "potrs", "n": N, "nrhs": nrhs, "ib": ib,
                "per_solve_s": round(per, 6),
                "gflops": round(2.0 * N * N * nrhs / per / 1e9, 1),
                "rhs_cols_per_s": round(nrhs / per, 1),
                "factor_read_gbs": round(4.0 * N * N / per / 1e9, 1),
            })
        del b0

    # ---- explicit-inverse fast path --------------------------------------
    inv = jax.jit(lambda l: potri(l, blocked=True, ib=1024))
    t0 = time.perf_counter()
    ainv = inv(l)
    _ = float(ainv[N - 1, N - 1])
    t_build_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    ainv = inv(l)
    _ = float(ainv[N - 1, N - 1])
    t_build = time.perf_counter() - t0
    # executed flops ~3*N^3 (full-width solve vs I + full NxN GEMM)
    log(f"potri build: cold {t_build_cold:.1f}s, warm {t_build:.3f}s "
        f"({3.0 * N**3 / t_build / 1e12:.1f} TF/s at 3*N^3 executed)")

    from dla_tpu.algos import solve_inverse

    for nrhs in (1, 128, 1024):
        b0 = jax.random.normal(jax.random.PRNGKey(0), (N, nrhs), jnp.float32)

        def chain(ainv, b0):
            def body(_i, x):
                return solve_inverse(ainv, b0 + jnp.float32(1e-20) * x)

            return lax.fori_loop(0, CHAIN, body, jnp.zeros_like(b0))

        per, xc = time_chain(
            jax.jit(chain), ainv, b0, N, nrhs, f"inverse nrhs={nrhs}"
        )
        row = {
            "path": "inverse", "n": N, "nrhs": nrhs, "ib": 1024,
            "per_solve_s": round(per, 6),
            "gflops": round(2.0 * N * N * nrhs / per / 1e9, 1),
            "rhs_cols_per_s": round(nrhs / per, 1),
            "ainv_read_gbs": round(4.0 * N * N / per / 1e9, 1),
            "build_warm_s": round(t_build, 3),
        }
        if nrhs == 128:
            # forward-error check (explicit inverse: ~kappa(A)*eps, a
            # weaker model than the backward-stable solve — wider gate)
            def check(a, x, b):
                r = jnp.matmul(a, x, precision="highest") - b
                na = jnp.max(jnp.sum(jnp.abs(a), axis=1))
                return (
                    jnp.max(jnp.abs(r)) / (na * jnp.max(jnp.abs(x)))
                ).astype(jnp.float32)

            x1 = jax.jit(solve_inverse)(ainv, b0)
            a2 = gen()
            res = float(jax.jit(check)(a2, x1, b0))
            del a2, x1
            gate = 2e-4
            row["residual"] = res
            log(f"[inverse nrhs=128] ||AX-B|| scaled = {res:.2e} "
                f"{'PASS' if res < gate else 'FAIL'} (gate {gate})")
        emit(row)
        del b0, xc

    log("done")


if __name__ == "__main__":
    main()
