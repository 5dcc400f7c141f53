"""On-chip 1e-10 residual CERTIFICATION of the df64 factor past N=8192.

STATUS_r4 left "on-chip residual certification currently reaches N≤8192
(the full slice set of L alongside both pairs exceeds HBM at 16384)" as
the r5 candidate; this probe closes it with the block-tiled residual
(`residual_potrf_df64_blocked`): factor N=16384/24576/32768 in df64 on
the chip (s=7, fused Pallas trailing), then measure the FULL
||A − L·Lᵀ||_inf / ||A||_inf reconstruction residual entirely on device —
the reference's gate contract (v6_test.c:87), not the O(n²) Freivalds
probe. Inputs are device-generated exact-fp32 SPD (al = 0 — the frontier
contract; the blocked residual's al=None path never allocates the zeros
plane).

Memory at N=32768: L pair 8 GiB + regenerated A 4 GiB + 2 strip slice
sets ~1.9 GiB ≈ 14 GiB on the 15.75 GiB chip — run smallest-first so a
frontier OOM still leaves the smaller certifications on record.

Run:  setsid nohup python benchmarks/df64_residual_cert.py \
        > benchmarks/results_r4/df64_residual_cert.log 2>&1 &
Appends to benchmarks/results_r4/df64_probe.jsonl (kind=df64_residual_cert).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "benchmarks", "results_r4", "df64_probe.jsonl")
BASELINE_FP64_GFLOPS = 204.8


def log(*a):
    print(*a, flush=True)


def emit(row):
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    log("ROW", json.dumps(row))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from dla_tpu.algos.potrf_df64 import (
        potrf_df64,
        residual_potrf_df64_blocked,
    )
    from dla_tpu.ops import plgsy

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup: {time.perf_counter() - t0:.1f}s")

    s = int(os.environ.get("DF64C_S", 7))
    rc = int(os.environ.get("DF64C_RC", 2048))
    sizes = [int(x) for x in os.environ.get(
        "DF64C_SIZES", "16384,24576,32768").split(",")]
    # donated-pair factor jit — same pattern/cache keys as df64_frontier.py
    fac = jax.jit(
        potrf_df64.__wrapped__,
        static_argnames=("nb", "refine", "s", "w", "precise_deg",
                         "trailing_strips", "trailing", "tb"),
        donate_argnums=(0, 1),
    )
    for n in sizes:
        tag = f"df64 residual cert N={n} s={s} rc={rc}"
        try:
            gen = jax.jit(
                lambda _n=n: plgsy(_n, bump=float(_n), seed=51,
                                   dtype=jnp.float32))
            ah = gen()
            al = jax.jit(jnp.zeros_like)(ah)
            _ = float(ah[0, 0])
            t0 = time.perf_counter()
            lh, ll = fac(ah, al, nb=1024, s=s, trailing="pallas", tb=512)
            _ = float(lh[n - 1, n - 1])
            fac_s = time.perf_counter() - t0
            gf = n**3 / 3 / fac_s / 1e9
            log(f"[{tag}] factor (compile+first): {fac_s:.1f}s")
            # the factor donated A — regenerate it (device-cheap, exact)
            ah = gen()
            _ = float(ah[0, 0])
            t0 = time.perf_counter()
            res = residual_potrf_df64_blocked(
                ah, None, lh, ll, s=s, rc=rc)
            res_s = time.perf_counter() - t0
            log(f"[{tag}] blocked residual: {res:.3e} in {res_s:.1f}s")
            emit({"kind": "df64_residual_cert", "n": n, "s": s,
                  "nb": 1024, "trailing": "pallas", "tb": 512, "rc": rc,
                  "input": "plgsy-f32-exact",
                  "residual_device_df64": float(res),
                  "gate_1e10": "PASS" if res < 1e-10 else "FAIL",
                  "residual_s": round(res_s, 1),
                  "factor_first_s": round(fac_s, 1),
                  "factor_first_gflops": round(gf, 1)})
            ah = al = lh = ll = None
        except Exception as e:  # noqa: BLE001 — log and continue
            emit({"kind": "df64_residual_cert", "n": n, "s": s, "rc": rc,
                  "error": f"{type(e).__name__}: {str(e)[:300]}"})
    log("df64 residual cert probe complete")


if __name__ == "__main__":
    main()
