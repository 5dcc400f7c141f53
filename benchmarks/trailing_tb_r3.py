"""Interleaved (tb, kb) sweep for the HBM-bound tiers (default fp32 and
bf16 storage) at their NB=4096 frontier, N=32768, chained convention.

Motivation (arithmetic): at tb=1024/kb=1024 each trailing block step is
2·tb²·kb = 2.1 GF (12 µs at the 182 TF/s 1-pass ceiling) against
~12-16 MB of C/pi/pj traffic → >1000 GB/s demanded vs ~819 GB/s HBM —
bound. tb=2048 quadruples flops per C tile while only doubling its
bytes; kb=nb removes the k-split revisits. If the working set fits VMEM,
the kernel should move from bandwidth- toward compute-bound.

Run:  python benchmarks/trailing_tb_r3.py >> benchmarks/results_r3/trailing_tb.jsonl 2>> benchmarks/results_r3/trailing_tb.log
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from dla_tpu.algos.potrf import potrf_inplace
from dla_tpu.ops import plgsy

N = int(os.environ.get("TT_N", 32768))
NB = int(os.environ.get("TT_NB", 4096))
K = int(os.environ.get("TT_CHAIN", 4))
ROUNDS = int(os.environ.get("TT_ROUNDS", 3))
# (storage, tb, kb) arms; kb > 100MB-VMEM feasibility is probed, not assumed
ARMS = [
    ("float32", 1024, 1024),   # current frontier (bench default tier)
    ("float32", 1024, 2048),
    ("float32", 1024, 4096),   # full-K
    ("float32", 2048, 1024),
    ("float32", 2048, 2048),
    ("bfloat16", 1024, 1024),  # current bf16 policy
    ("bfloat16", 1024, 4096),
    ("bfloat16", 2048, 2048),
    ("bfloat16", 2048, 4096),
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make(storage, tb, kb):
    dt = jnp.bfloat16 if storage == "bfloat16" else jnp.float32

    def genf(s):
        a = plgsy(N, bump=float(N), seed=51, dtype=jnp.float32)
        a = a.at[0, 0].add(1e-3 + s * 1e-9)
        return a if dt == jnp.float32 else a.astype(dt)

    link = jax.jit(lambda s: potrf_inplace(
        genf(s), nb=NB, tb=tb, kb=kb, diag_factor="twolevel",
        precision="default")[N - 1, N - 1].astype(jnp.float32))
    genlink = jax.jit(lambda s: genf(s)[N - 1, N - 1].astype(jnp.float32))
    return link, genlink


def timed(fn, s):
    t0 = time.perf_counter()
    for _i in range(K):
        s = fn(s)
    _ = float(s)
    return time.perf_counter() - t0


def main():
    log(f"backend={jax.default_backend()} N={N} NB={NB} arms={ARMS}")
    s = jnp.float32(0.0)
    arms = {}
    for storage, tb, kb in ARMS:
        name = f"{storage[:4]}_tb{tb}_kb{kb}"
        try:
            link, genlink = make(storage, tb, kb)
            t0 = time.perf_counter()
            _ = float(link(s))
            log(f"{name} compile+run {time.perf_counter() - t0:.1f}s")
            _ = float(genlink(s))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"arm": name, "error": repr(e)[:400]}),
                  flush=True)
            log(f"{name} FAILED: {repr(e)[:200]}")
            continue
        arms[name] = (link, genlink)
    flops = N**3 / 3
    for r in range(ROUNDS):
        for name, (link, genlink) in arms.items():
            tc = timed(link, s)
            tg = timed(genlink, s)
            per = (tc - tg) / K
            gf = flops / per / 1e9
            print(json.dumps({"round": r, "arm": name,
                              "per_factor_s": round(per, 4),
                              "gflops": round(gf, 1)}), flush=True)
            log(f"r{r} {name}: {per:.4f}s -> {gf/1e3:.2f} TF/s")


if __name__ == "__main__":
    main()
