"""Interleaved A/B: potrf_inplace panel='blocktrsm' vs 'pallas' (ib=256)
at the headline config (N=32768, NB=1024, kb=1024, `high`), chained
timing, alternating measurements in ONE process so compile-cache and
chip-state noise hits both arms equally.

Run:  python benchmarks/panel_ab_r3.py >> benchmarks/results_r3/panel_ab.jsonl 2>> benchmarks/results_r3/panel_ab.log
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

N = int(os.environ.get("AB_N", 32768))
NB = int(os.environ.get("AB_NB", 1024))
KB = int(os.environ.get("AB_KB", 1024))
K = int(os.environ.get("AB_CHAIN", 4))
ROUNDS = int(os.environ.get("AB_ROUNDS", 3))
PREC = os.environ.get("AB_PREC", "high")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make(panel):
    # bench.py's chained convention: ONE factorization per jit call with a
    # scalar carry (K host dispatches pipeline on-device; the single
    # trailing RTT cancels in the gen-chain subtraction). Unrolling K links
    # in one program OOMs — XLA live-ranges every link's buffers at once.
    def genf(s):
        a = plgsy(N, bump=float(N), seed=51, dtype=jnp.float32)
        return a.at[0, 0].add(1e-3 + s * 1e-9)

    link = jax.jit(lambda s: potrf_inplace(
        genf(s), nb=NB, tb=1024, kb=KB, diag_factor="twolevel",
        precision=PREC, panel=panel)[N - 1, N - 1].astype(jnp.float32))
    genlink = jax.jit(lambda s: genf(s)[N - 1, N - 1].astype(jnp.float32))
    return link, genlink


def timed(fn, s):
    t0 = time.perf_counter()
    for _i in range(K):
        s = fn(s)
    _ = float(s)
    return time.perf_counter() - t0


def main():
    log(f"backend={jax.default_backend()} N={N} NB={NB} kb={KB} prec={PREC}")
    arms = {p: make(p) for p in ("blocktrsm", "pallas")}
    s = jnp.float32(0.0)
    for name, (link, genlink) in arms.items():
        t0 = time.perf_counter()
        _ = float(link(s))
        log(f"{name} link compile+run {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        _ = float(genlink(s))
        log(f"{name} gen compile+run {time.perf_counter() - t0:.1f}s")
    flops = N**3 / 3
    for r in range(ROUNDS):
        for name, (link, genlink) in arms.items():
            tc = timed(link, s)
            tg = timed(genlink, s)
            per = (tc - tg) / K
            gf = flops / per / 1e9
            print(json.dumps({"round": r, "panel": name,
                              "chain_s": round(tc, 4), "gen_s": round(tg, 4),
                              "per_factor_s": round(per, 4),
                              "gflops": round(gf, 1)}), flush=True)
            log(f"r{r} {name}: {per:.4f}s/factor -> {gf/1e3:.2f} TF/s")


if __name__ == "__main__":
    main()
