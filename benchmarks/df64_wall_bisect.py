"""Pin the packed-df64 N=49152 compile wall (VERDICT r4 next-round #3).

r4's negative result: potrf_packed_df64 at N=49152 (aliased pair ~9.2
GiB) crashes the remote compile helper (HTTP 500, subprocess exit 1) at
both nb=1024 and nb=2048 — the working hypothesis is ARGUMENT size, not
program size (the r3 fp32 packed stretch hit the same wall at a ≥12.7
GiB single argument). This probe makes the boundary a number:

1. hypothesis test, cheap: a TRIVIAL donated elementwise program over a
   pair of the exact N=49152 packed shapes (2 x 4.6 GiB aliased args).
   If THIS crashes the helper, the wall is argument size and no program
   restructuring can pass it; if it compiles, the wall is program
   complexity x argument footprint;
2. bisect the factorization: compile+run the real potrf_packed_df64 at
   N in {46080, 48128} (pair 8.1 / 8.8 GiB) between the known-good
   45056 and the known-crash 49152;
3. split attempt at 49152: hi/lo as two UNALIASED donated args is the
   same footprint, so instead try nb=2048 with ktb=1024 (half the wave
   count) only if (1) says program complexity matters.

Every outcome (incl. helper crashes) lands as a row; crashes do not
poison the queue (exit-1 is a clean failure, r4 observed twice).

Run:  setsid nohup python benchmarks/df64_wall_bisect.py \
        > benchmarks/results_r5/df64_wall_bisect.log 2>&1 &
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


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from dla_tpu.algos.packed import plgsy_packed
    from dla_tpu.algos.potrf_df64 import potrf_packed_df64

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup: {time.perf_counter() - t0:.1f}s")

    nb = 1024

    # --- 1. argument-size hypothesis: trivial program, 49152-pair args ---
    n = 49152
    shape = (n * (n + nb) // 2 // nb, nb)
    log(f"[hyp] trivial donated program over pair of {shape} f32 "
        f"({2 * 4 * shape[0] * shape[1] / 2**30:.1f} GiB)")
    try:
        f = jax.jit(lambda h, l: (h + jnp.float32(1), l + jnp.float32(1)),
                    donate_argnums=(0, 1))
        h = jnp.zeros(shape, jnp.float32)
        l = jnp.zeros(shape, jnp.float32)
        t0 = time.perf_counter()
        h, l = f(h, l)
        v = float(h[0, 0])
        emit({"kind": "df64_wall_hypothesis", "n": n, "nb": nb,
              "trivial_pair_program": "OK", "value": v,
              "t_s": round(time.perf_counter() - t0, 1),
              "conclusion": "argument size alone does NOT crash the "
              "helper -> the wall is program complexity x footprint"})
        h = l = None
    except Exception as e:  # noqa: BLE001
        emit({"kind": "df64_wall_hypothesis", "n": n, "nb": nb,
              "trivial_pair_program": "CRASH",
              "error": f"{type(e).__name__}: {str(e)[:300]}",
              "conclusion": "argument size alone crashes the helper -> "
              "no program restructuring can pass 49152 on this service"})

    # --- 2. bisect the real factorization between 45056 and 49152 ---
    fac = jax.jit(
        potrf_packed_df64,
        static_argnames=("n", "nb", "ktb", "refine", "s", "w",
                         "precise_deg"),
        donate_argnums=(0, 1))
    for n in (46080, 48128):
        tag = f"bisect N={n}"
        try:
            gen = jax.jit(lambda _n=n: plgsy_packed(
                _n, nb, bump=float(_n), seed=51, dtype=jnp.float32))
            aph = gen()
            apl = jax.jit(jnp.zeros_like)(aph)
            _ = float(aph[0, 0])
            t0 = time.perf_counter()
            lph, lpl = fac(aph, apl, n, nb, ktb=512, s=7)
            _ = float(lph[n // nb, 0])
            compile_s = time.perf_counter() - t0
            # one timed re-run
            lph = lpl = None
            aph = gen()
            apl = jax.jit(jnp.zeros_like)(aph)
            _ = float(aph[0, 0])
            t0 = time.perf_counter()
            lph, lpl = fac(aph, apl, n, nb, ktb=512, s=7)
            _ = float(lph[n // nb, 0])
            t = time.perf_counter() - t0
            gf = n**3 / 3 / t / 1e9
            emit({"kind": "df64_wall_bisect", "n": n, "nb": nb, "s": 7,
                  "compile_s": round(compile_s, 1), "t_s": round(t, 3),
                  "gflops": round(gf, 1),
                  "vs_reference_fp64": round(gf / BASELINE_FP64_GFLOPS, 1),
                  "pair_gib": round(8 * n * (n + nb) / 2 / 2**30, 2),
                  "result": "OK"})
            lph = lpl = None
        except Exception as e:  # noqa: BLE001
            emit({"kind": "df64_wall_bisect", "n": n, "nb": nb,
                  "pair_gib": round(8 * n * (n + nb) / 2 / 2**30, 2),
                  "result": "CRASH",
                  "error": f"{type(e).__name__}: {str(e)[:300]}"})
    log("df64 wall bisect complete")


if __name__ == "__main__":
    main()
