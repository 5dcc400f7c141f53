"""Batched solve serving throughput on the real chip — r3 s8.

The solve half of the batched serving workload (`batched_factor.jsonl`):
B resident small factors (`potrf_batched`), answer B independent
(n, nrhs) RHS blocks per query with `potrs_batched` — the
Kalman/covariance-serving shape. Chained on-device (each step's RHS is
perturbed by a scalar from the previous solve), matrices/s is the
serving metric.

Run (detached — CLAUDE.md compile-service rules):
    setsid nohup python benchmarks/batched_solve_probe.py \
        > benchmarks/results_r3/batched_solve.log 2>&1 &
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

CHAIN = 16
NRHS = 8
CONFIGS = [  # (batch, n, nb)
    (512, 256, 64),
    (32, 1024, 256),
]
OUT = os.path.join(REPO, "benchmarks/results_r3/batched_solve.jsonl")


def log(*a):
    print(*a, flush=True)


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dla_tpu.algos import potrs_batched
    from dla_tpu.algos.potri import potrf_batched

    log(f"backend={jax.default_backend()} chain={CHAIN} nrhs={NRHS}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup (first-contact): {time.perf_counter() - t0:.1f}s")

    for batch, n, nb in CONFIGS:
        key = jax.random.PRNGKey(batch + n)
        g = jax.random.normal(key, (batch, n, n), jnp.float32)
        a = (g + g.swapaxes(-1, -2)) / 2 + float(n) * jnp.eye(
            n, dtype=jnp.float32
        )
        ls = jax.jit(lambda x: potrf_batched(x, nb=nb))(a)
        b0 = jax.random.normal(jax.random.PRNGKey(1), (batch, n, NRHS),
                               jnp.float32)

        def chain(ls, b0):
            def body(_i, x):
                return potrs_batched(ls, b0 + jnp.float32(1e-20) * x)

            return lax.fori_loop(0, CHAIN, body, jnp.zeros_like(b0))

        cf = jax.jit(chain)
        t0 = time.perf_counter()
        xc = cf(ls, b0)
        _ = float(xc[batch - 1, n - 1, NRHS - 1])
        log(f"[B={batch} n={n}] chain compile+warm: "
            f"{time.perf_counter() - t0:.1f}s")
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            xc = cf(ls, b0)
            _ = float(xc[batch - 1, n - 1, NRHS - 1])
            times.append(time.perf_counter() - t0)
        per = sorted(times)[1] / CHAIN
        # forward-error gate on one matrix of one solve
        x1 = jax.jit(potrs_batched)(ls, b0)
        r = jnp.matmul(a[0], x1[0], precision="highest") - b0[0]
        na = jnp.max(jnp.sum(jnp.abs(a[0]), axis=1))
        res = float(jnp.max(jnp.abs(r)) / (na * jnp.max(jnp.abs(x1[0]))))
        gate = max(n * 2e-7, 1e-5)
        row = {
            "batch": batch, "n": n, "nb": nb, "nrhs": NRHS,
            "per_batch_s": round(per, 6),
            "matrices_per_s": round(batch / per, 1),
            "residual": res,
        }
        log(f"[B={batch} n={n}] forward error {res:.2e} "
            f"{'PASS' if res < gate else 'FAIL'} (gate {gate:.1e})")
        log(json.dumps(row))
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        del a, ls, b0, xc, x1

    log("done")


if __name__ == "__main__":
    main()
