"""Wall-split round 2: certify + time N past the monolith compile wall.

Round 1 (df64_wall_split.py) CRACKED the compile wall: split=3 at
N=49152 compiled and executed a full factorization on chip
(compile+first 525.1 s — the monolith HTTP-500s the compile helper at
N>=48128). But the repeat-timing loop RESOURCE_EXHAUSTed: the pair is
9.19 GiB and the per-step set_col DUS transient adds ~4.6 GiB, so the
first run sits at the HBM edge and the fresh-pair rerun lost to
fragmentation; after one OOM the process is poisoned (split=6/12
escalation rows were fallout, not signal).

This probe orders the work memory-safely, stopping at the first size
that fully certifies:
  1. factor once (program loads paid here; compiles are .jax_cache
     warm from round 1)
  2. certify IMMEDIATELY off that factor (packed-native streaming
     Freivalds — tile-sized transients, no unpack)
  3. free + settle, then ONE timed re-run (executables resident, no
     load cost); on OOM, sleep 60 and retry once; if timing still
     OOMs, emit the row with first-run wall time as an upper bound
     (loads included) — the capability and the residual are the point.

Run:  setsid nohup python benchmarks/df64_wall_split2.py \
        > benchmarks/results_r5/df64_wall_split2.log 2>&1 &
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


def run_size(n, nb, split):
    import jax
    import jax.numpy as jnp

    from dla_tpu.algos.packed import plgsy_packed
    from dla_tpu.algos.potrf_df64 import (
        freivalds_packed_df64, potrf_packed_df64_split)

    s = 7
    tag = f"wall2 N={n} nb={nb} split={split}"
    gen = jax.jit(lambda: plgsy_packed(
        n, nb, bump=float(n), seed=51, dtype=jnp.float32))
    zeros = jax.jit(jnp.zeros_like)

    def fresh():
        h = gen()
        l = zeros(h)
        _ = float(h[0, 0])
        return h, l

    row = {"kind": "df64_wall_split2", "n": n, "s": s, "nb": nb,
           "split": split, "input": "plgsy-f32-exact-packed",
           "pair_gib": round(8 * n * (n + nb) / 2 / 2**30, 2)}
    # 1. factor (loads paid here)
    aph, apl = fresh()
    t0 = time.perf_counter()
    lph, lpl = potrf_packed_df64_split(aph, apl, n, nb, split=split, s=s)
    _ = float(lph[n // nb, 0])
    first_s = time.perf_counter() - t0
    aph = apl = None
    log(f"[{tag}] first run (loads included): {first_s:.1f}s")
    row["first_run_s"] = round(first_s, 1)
    # 2. certify off this factor — small transients, do it before any
    #    further big allocation
    t0 = time.perf_counter()
    try:
        fr = float(freivalds_packed_df64(lph, lpl, n, nb, s=s))
        row["freivalds_df64"] = fr
        row["gate_1e10"] = "PASS" if fr < 1e-10 else "FAIL"
        row["cert_s"] = round(time.perf_counter() - t0, 1)
        row["cert"] = ("packed-native streaming df64 Freivalds "
                       "(no unpack, A from seed)")
        log(f"[{tag}] freivalds {fr:.3e} {row['gate_1e10']} "
            f"({row['cert_s']}s)")
    except Exception as e:  # noqa: BLE001
        row["freivalds_error"] = f"{type(e).__name__}: {str(e)[:200]}"
        log(f"[{tag}] cert failed: {row['freivalds_error']}")
    # 3. timed re-run (no load cost), OOM-tolerant
    lph = lpl = None
    for attempt in (1, 2):
        time.sleep(30 * attempt)
        try:
            aph, apl = fresh()
            t0 = time.perf_counter()
            lph, lpl = potrf_packed_df64_split(
                aph, apl, n, nb, split=split, s=s)
            _ = float(lph[n // nb, 0])
            t = time.perf_counter() - t0
            row["t_s"] = round(t, 3)
            row["gflops"] = round(n**3 / 3 / t / 1e9, 1)
            row["vs_reference_fp64"] = round(
                row["gflops"] / BASELINE_FP64_GFLOPS, 1)
            log(f"[{tag}] timed: {t:.3f}s -> {row['gflops']} GF/s")
            lph = lpl = aph = apl = None
            break
        except Exception as e:  # noqa: BLE001
            lph = lpl = aph = apl = None
            row[f"rerun_error_{attempt}"] = (
                f"{type(e).__name__}: {str(e)[:160]}")
            log(f"[{tag}] timed re-run attempt {attempt} failed: {e}")
    if "gflops" not in row and "first_run_s" in row:
        # upper bound: first run includes ~split x 45-90s program loads
        row["gflops_upper_bound_note"] = (
            "timed re-run OOMed; first_run_s includes program loads")
        row["gflops_lower_bound"] = round(
            n**3 / 3 / first_s / 1e9, 1)
    emit(row)
    return "gate_1e10" in row and row["gate_1e10"] == "PASS"


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

    n = int(os.environ.get("DF64W2_N", 49152))
    split = int(os.environ.get("DF64W2_SPLIT", 3))
    run_size(n, 1024, split)
    log("wall-split2 probe complete")


if __name__ == "__main__":
    main()
