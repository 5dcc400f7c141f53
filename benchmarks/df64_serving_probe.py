"""df64 serving timing on chip (VERDICT r4 next-round #8): the
fp64-contract SOLVE from the packed df64 factor, measured.

potrs_packed_df64 was CPU-correctness-only (posv 4e-14 vs true fp64,
tests/test_df64.py); this probe times it on the real chip at the
certified factor size (N=24576 — blocked residual 4.19e-11, Freivalds
6.75e-14) across an NRHS sweep, completing the fp64-contract serving
story (the reference's full-solve north star, BASELINE.json config 3).

Run:  setsid nohup python benchmarks/df64_serving_probe.py \
        > benchmarks/results_r5/df64_serving.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

OUTDIR = os.path.join(REPO, "benchmarks", "results_r5")
OUT = os.path.join(OUTDIR, "df64_probe.jsonl")


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
    import numpy as np

    from dla_tpu.algos.packed import plgsy_packed
    from dla_tpu.algos.potrf_df64 import (
        _packed_matvec_df64,
        _packed_tile_desc,
        _strip_abs_rowsums_gen,
        potrf_packed_df64,
        potrs_packed_df64,
    )
    from dla_tpu.ops.df64 import df_sub

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup: {time.perf_counter() - t0:.1f}s")

    n = int(os.environ.get("DF64SV_N", 24576))
    nb = int(os.environ.get("DF64SV_NB", 1024))
    s = int(os.environ.get("DF64SV_S", 7))
    nrhs_list = [int(x) for x in os.environ.get(
        "DF64SV_NRHS", "1,64,512").split(",")]

    # factor once (program cached from the record-cert runs)
    aph = jax.jit(lambda: plgsy_packed(
        n, nb, bump=float(n), seed=51, dtype=jnp.float32))()
    _ = float(aph[0, 0])
    fac = jax.jit(
        potrf_packed_df64,
        static_argnames=("n", "nb", "ktb", "refine", "s", "w",
                         "precise_deg"),
        donate_argnums=(0, 1))
    t0 = time.perf_counter()
    lph, lpl = fac(aph, jnp.zeros_like(aph), n, nb, ktb=512, s=s)
    _ = float(lph[n // nb, 0])
    log(f"factor ready in {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(9)
    for nrhs in nrhs_list:
        try:
            b = jnp.asarray(rng.standard_normal((n, nrhs)).astype(np.float32))
            bl = jnp.zeros_like(b)
            # engine="matvec": the compact descriptor-table fori
            # reconstruction — the trmm engine's ~28·nt unrolled dots
            # jitted as one program ground the remote compile service
            # for 1h+ at nt=24 (r5 first attempt)
            solve = jax.jit(functools.partial(
                potrs_packed_df64, n=n, nb=nb, s=s,
                engine=os.environ.get("DF64SV_ENGINE", "matvec")))
            t0 = time.perf_counter()
            xh, xl = solve(lph, lpl, b, bl)
            _ = float(xh[n - 1, nrhs - 1])
            compile_s = time.perf_counter() - t0
            times = []
            for _i in range(3):
                t0 = time.perf_counter()
                xh, xl = solve(lph, lpl, b, bl)
                _ = float(xh[n - 1, nrhs - 1])
                times.append(time.perf_counter() - t0)
            t = sorted(times)[1]
            # df64 posv-style residual ON DEVICE via the same compact
            # matvec programs the solve compiles (cache-shared)
            desc = jnp.asarray(_packed_tile_desc(n, nb))
            mv = dict(nb=nb, s=s, w=8, precise_deg=3)
            th, tl = _packed_matvec_df64(lph, lpl, desc, xh, xl,
                                         trans=True, **mv)
            ph, pl = _packed_matvec_df64(lph, lpl, desc, th, tl,
                                         trans=False, **mv)
            rh, rl = df_sub(b, bl, ph, pl)
            num = float(jnp.max(jnp.abs(rh + rl)))
            # denominator: the posv convention ||A||_inf * ||X||_inf
            # (first attempt used ||B|| — ~5000x too small at this n,
            # which read the df64-matvec truncation noise as a 2e-10
            # gate FAIL; the solve itself is df64-grade)
            anorm = 0.0
            for r0 in range(0, n, 1024):
                anorm = max(anorm, float(jnp.max(_strip_abs_rowsums_gen(
                    51, r0, rc=1024, n=n, bump=float(n)))))
            den = anorm * float(jnp.max(jnp.abs(xh + xl)))
            res = num / den
            emit({"kind": "df64_serving", "n": n, "nb": nb, "s": s,
                  "nrhs": nrhs, "t_s": round(t, 4),
                  "cols_per_s": round(nrhs / t, 2),
                  "compile_s": round(compile_s, 1),
                  "posv_residual_device": res,
                  "gate_1e10": "PASS" if res < 1e-10 else "FAIL"})
        except Exception as e:  # noqa: BLE001
            emit({"kind": "df64_serving", "n": n, "nrhs": nrhs,
                  "error": f"{type(e).__name__}: {str(e)[:300]}"})
    log("df64 serving probe complete")


if __name__ == "__main__":
    main()
