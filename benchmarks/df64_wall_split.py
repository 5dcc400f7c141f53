"""Crack the packed-df64 compile wall with segmented programs (r5).

The r5 bisect pinned the wall as program×footprint: the monolithic
potrf_packed_df64 compiles at N=46080 (nt=45 unrolled steps, 8.09 GiB
pair) and HTTP-500s the remote compile helper at N=48128 (nt=47,
8.81 GiB), while a TRIVIAL donated program over the full N=49152 pair
compiles fine. potrf_packed_df64_split breaks the factorization into
`split` host-sequenced jitted segments of ~nt/split steps each (pair
donated through), so each program is far inside the wall.

This probe: N=49152 nb=1024 split=3 (16 steps/program ≈ 1/3 of the
known-good 45) → time 3 iters → certify with the packed-native
streaming df64 Freivalds (no unpack, A from seed — runs at any size).
On a compile crash, escalate split 3 → 6 → 12. If 49152 certifies and
the wall-clock budget allows, stretch to N=53248 (pair 10.8 GiB) with
split=6.

Run:  setsid nohup python benchmarks/df64_wall_split.py \
        > benchmarks/results_r5/df64_wall_split.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

OUTDIR = os.path.join(REPO, "benchmarks", "results_r5")
OUT = os.path.join(OUTDIR, "df64_probe.jsonl")
BASELINE_FP64_GFLOPS = 204.8


def log(*a):
    print(*a, flush=True)


def emit(row):
    os.makedirs(OUTDIR, exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    log("ROW", json.dumps(row))


def run_size(n, nb, splits, iters=3, cert=True):
    import jax
    import jax.numpy as jnp

    from dla_tpu.algos.packed import plgsy_packed
    from dla_tpu.algos.potrf_df64 import (
        freivalds_packed_df64, potrf_packed_df64_split)

    s = 7
    gen = jax.jit(lambda: plgsy_packed(
        n, nb, bump=float(n), seed=51, dtype=jnp.float32))
    zeros = jax.jit(jnp.zeros_like)

    def fresh():
        h = gen()
        return h, zeros(h)

    for split in splits:
        tag = f"packed-df64-split N={n} nb={nb} split={split}"
        try:
            aph, apl = fresh()
            _ = float(aph[0, 0])
            t0 = time.perf_counter()
            lph, lpl = potrf_packed_df64_split(
                aph, apl, n, nb, split=split, s=s)
            _ = float(lph[n // nb, 0])
            compile_s = time.perf_counter() - t0
            log(f"[{tag}] compile+first: {compile_s:.1f}s")
            times = []
            for _i in range(iters):
                lph = lpl = None
                aph, apl = fresh()  # un-timed (reference times dpotrf only)
                _ = float(aph[0, 0])
                t0 = time.perf_counter()
                lph, lpl = potrf_packed_df64_split(
                    aph, apl, n, nb, split=split, s=s)
                _ = float(lph[n // nb, 0])
                times.append(time.perf_counter() - t0)
                log(f"[{tag}] iter: {times[-1]:.3f}s -> "
                    f"{n**3 / 3 / times[-1] / 1e9:.1f} GF/s")
            t = sorted(times)[len(times) // 2]
            gf = n**3 / 3 / t / 1e9
            row = {"kind": "df64_wall_split", "n": n, "s": s, "nb": nb,
                   "split": split, "input": "plgsy-f32-exact-packed",
                   "pair_gib": round(8 * n * (n + nb) / 2 / 2**30, 2),
                   "gflops": round(gf, 1), "t_s": round(t, 3),
                   "vs_reference_fp64": round(gf / BASELINE_FP64_GFLOPS, 1),
                   "compile_s": round(compile_s, 1)}
            if cert:
                aph = apl = None
                t0 = time.perf_counter()
                try:
                    fr = float(freivalds_packed_df64(lph, lpl, n, nb, s=s))
                    row["freivalds_df64"] = fr
                    row["gate_1e10"] = "PASS" if fr < 1e-10 else "FAIL"
                    row["cert_s"] = round(time.perf_counter() - t0, 1)
                    row["cert"] = ("packed-native streaming df64 Freivalds "
                                   "(no unpack, A from seed)")
                except Exception as e:  # noqa: BLE001
                    row["freivalds_error"] = (
                        f"{type(e).__name__}: {str(e)[:200]}")
            emit(row)
            return True
        except Exception as e:  # noqa: BLE001
            emit({"kind": "df64_wall_split", "n": n, "nb": nb,
                  "split": split,
                  "pair_gib": round(8 * n * (n + nb) / 2 / 2**30, 2),
                  "result": "CRASH",
                  "error": f"{type(e).__name__}: {str(e)[:300]}"})
    return False


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup: {time.perf_counter() - t0:.1f}s")

    budget_s = float(os.environ.get("DF64WS_BUDGET_S", 2400))
    start = time.perf_counter()
    ok = run_size(49152, 1024, splits=(3, 6, 12))
    if ok and time.perf_counter() - start < budget_s * 0.5:
        # stretch: pair 10.8 GiB; trailing transients + cert fit a
        # 14.5 GiB budget on paper — emit a crash row if they don't.
        run_size(53248, 1024, splits=(6,))
    log("wall-split probe complete")


if __name__ == "__main__":
    main()
