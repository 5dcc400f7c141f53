"""Batched small-SPD factorization throughput on the real chip — r3 s8.

``potrf_batched`` (vmapped blocked POTRF) expresses a workload the
reference's one-matrix-per-process drivers cannot: many independent
small SPD factorizations in one MXU-batched program (covariance/Kalman
serving shapes). This measures matrices/s and GF/s (B·n³/3) for a few
(batch, n) points, chained on-device (each step's batch is perturbed by
a scalar from the previous step's result, so XLA cannot parallelize or
elide the sequence — bench.py's convention).

Run (detached — CLAUDE.md compile-service rules):
    setsid nohup python benchmarks/batched_factor_probe.py \
        > benchmarks/results_r3/batched_factor.log 2>&1 &
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
CONFIGS = [  # (batch, n, nb)
    (512, 256, 64),
    (128, 512, 128),
    (32, 1024, 256),
]
OUT = os.path.join(REPO, "benchmarks/results_r3/batched_factor.jsonl")


def log(*a):
    print(*a, flush=True)


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dla_tpu.algos.potri import potrf_batched
    from dla_tpu.validate import residual_potrf

    log(f"backend={jax.default_backend()} chain={CHAIN}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup (first-contact): {time.perf_counter() - t0:.1f}s")

    for batch, n, nb in CONFIGS:
        key = jax.random.PRNGKey(batch + n)
        g = jax.random.normal(key, (batch, n, n), jnp.float32)
        a = (g + g.swapaxes(-1, -2)) / 2 + float(n) * jnp.eye(
            n, dtype=jnp.float32
        )

        def chain(a):
            def body(_i, carry):
                s, _l = carry
                ls = potrf_batched(
                    a + (jnp.float32(1e-6) * s) * jnp.eye(n, dtype=a.dtype), nb=nb
                )
                return jnp.abs(ls[0, 0, 0]), ls

            return lax.fori_loop(
                0, CHAIN, body, (jnp.float32(0.0), jnp.zeros_like(a))
            )

        cf = jax.jit(chain)
        t0 = time.perf_counter()
        _s, ls = cf(a)
        _ = float(ls[batch - 1, n - 1, n - 1])
        log(f"[B={batch} n={n}] chain compile+warm: "
            f"{time.perf_counter() - t0:.1f}s")
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _s, ls = cf(a)
            _ = float(ls[batch - 1, n - 1, n - 1])
            times.append(time.perf_counter() - t0)
        per = sorted(times)[1] / CHAIN
        # residual gate on an unchained factor of the same batch (the
        # chained ls saw a perturbed A; fp32 grade ~ n*eps, validator
        # precision pinned inside residual_potrf)
        l1 = jax.jit(lambda x: potrf_batched(x, nb=nb))(a)
        res = float(residual_potrf(a[0], l1[0]))
        del l1
        gate = n * 2e-6
        flops = batch * n**3 / 3.0
        row = {
            "batch": batch, "n": n, "nb": nb,
            "per_batch_s": round(per, 6),
            "matrices_per_s": round(batch / per, 1),
            "gflops": round(flops / per / 1e9, 1),
            "residual": res,
        }
        log(f"[B={batch} n={n}] residual {res:.2e} "
            f"{'PASS' if res < gate else 'FAIL'} (gate {gate:.1e})")
        log(json.dumps(row))
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        del a, ls

    log("done")


if __name__ == "__main__":
    main()
