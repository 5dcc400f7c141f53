"""On-chip A/B of the df64 trailing backends: XLA strip loop vs the fused
Pallas pass-loop kernel (kernels/df64_tiles.py) — the r4 perf lever for
the emulated-fp64 tier.

The XLA path measured 2.8 TF/s logical at N=16384 (33% of the 8.7 TF/s
21-pass bound): every pass partial round-trips HBM. The fused kernel
loads/stores the C pair once per panel step. Expect the gap to close
toward the pass bound; the residual must be unchanged (same pass set and
chunking, compensated accumulation in VMEM).

Run:  setsid nohup python benchmarks/df64_trailing_ab.py \
        > benchmarks/results_r4/df64_trailing_ab.log 2>&1 &
Appends JSON rows to benchmarks/results_r4/df64_probe.jsonl.
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
    import numpy as np

    from dla_tpu.algos.potrf_df64 import potrf_df64, residual_potrf_df64
    from dla_tpu.ops.df64 import to_df64

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup: {time.perf_counter() - t0:.1f}s")

    sizes = [int(x) for x in os.environ.get(
        "DF64AB_SIZES", "8192,16384").split(",")]
    nmax = max(sizes)
    rng = np.random.default_rng(51)
    t0 = time.perf_counter()
    gbig = rng.standard_normal((nmax, nmax))
    gbig += gbig.T.copy()
    gbig *= 0.5
    gbig[np.arange(nmax), np.arange(nmax)] += nmax
    log(f"host gen: {time.perf_counter() - t0:.1f}s")

    s = int(os.environ.get("DF64AB_S", 7))
    for n in sizes:
        ah, al = to_df64(gbig[:n, :n])
        _ = float(ah[0, 0]) + float(al[0, 0])
        configs = [("xla", 512), ("pallas", 512), ("pallas", 1024)]
        for trailing, tb in configs:
            tag = f"df64ab N={n} s={s} trailing={trailing} tb={tb}"
            if trailing == "xla" and tb != 512:
                continue
            try:
                t0 = time.perf_counter()
                lh, ll = potrf_df64(
                    ah, al, nb=1024, s=s, trailing=trailing, tb=tb)
                _ = float(lh[n - 1, n - 1])
                compile_s = time.perf_counter() - t0
                log(f"[{tag}] compile+first: {compile_s:.1f}s")
                times = []
                for _i in range(3):
                    t0 = time.perf_counter()
                    lh, ll = potrf_df64(
                        ah, al, nb=1024, s=s, trailing=trailing, tb=tb)
                    _ = float(lh[n - 1, n - 1])
                    times.append(time.perf_counter() - t0)
                    log(f"[{tag}] iter: {times[-1]:.3f}s -> "
                        f"{n**3 / 3 / times[-1] / 1e9:.1f} GF/s")
                t = sorted(times)[1]
                gf = n**3 / 3 / t / 1e9
                row = {"kind": "df64_trailing_ab", "n": n, "s": s,
                       "trailing": trailing, "tb": tb,
                       "gflops": round(gf, 1), "t_s": round(t, 3),
                       "vs_reference_fp64": round(
                           gf / BASELINE_FP64_GFLOPS, 1),
                       "compile_s": round(compile_s, 1)}
                try:
                    if n <= 8192:
                        row["residual_device_df64"] = float(
                            residual_potrf_df64(ah, al, lh, ll, s=s))
                except Exception as e:  # noqa: BLE001
                    row["residual_error"] = f"{type(e).__name__}"
                emit(row)
                del lh, ll
            except Exception as e:  # noqa: BLE001
                emit({"kind": "df64_trailing_ab", "n": n, "s": s,
                      "trailing": trailing, "tb": tb,
                      "error": f"{type(e).__name__}: {str(e)[:300]}"})
        del ah, al
    log("df64 trailing A/B complete")


if __name__ == "__main__":
    main()
