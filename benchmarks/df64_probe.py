"""On-chip probe of the emulated-fp64 (df64) factorization — VERDICT r3
next-round #2: "the last capability where the reference (fp64 dpotrf at
205 GF/s, v6_test.c:57) does something the rebuild's accelerator path
cannot."

Measures, on the real TPU chip:
- df64 GEMM micro rate (logical 2mnk flops / time) — the kernel ceiling;
- potrf_df64 end-to-end at N=4096/8192(/16384), s=6 and s=7 slice
  configs, 3 timed repeats (raw per-invocation convention);
- the residual BOTH ways: on-device df64 norm (residual_potrf_df64) and,
  where the pair fits the host budget, the exact host fp64 residual of
  the pulled-back factor — the ≤1e-10 reference gate (v6_test.c:87).

Host generation note: fp64 inputs are built on the host; this VM's
balloon-throttled page supply makes fresh multi-GiB numpy arrays
minutes-scale (CLAUDE.md), so sizes run smallest-first and buffers are
reused across configs.

Run:
    setsid nohup python benchmarks/df64_probe.py \
        > benchmarks/results_r4/df64_probe.log 2>&1 &
Appends one JSON line per config to benchmarks/results_r4/df64_probe.jsonl.
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
BASELINE_FP64_GFLOPS = 204.8  # the reference's fp64 repo-best (BASELINE.md)


def log(*a):
    print(*a, flush=True)


def emit(row):
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    log("ROW", json.dumps(row))


def main():
    sizes = [int(s) for s in os.environ.get(
        "DF64_SIZES", "4096,8192,16384").split(",")]
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from dla_tpu.algos.potrf_df64 import potrf_df64, residual_potrf_df64
    from dla_tpu.ops.df64 import df64_matmul_nt, from_df64, to_df64

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup: {time.perf_counter() - t0:.1f}s")

    # --- GEMM micro: logical rate of the df64 product -----------------------
    # (s=7's 28 concurrent (m,n) f32 partials OOM HBM at m=n=8192 — XLA
    # keeps many pass temps live; probe it at half the output size)
    for s, m in ((6, 8192), (7, 4096)):
        n = m
        k = 4096
        try:
            rng = np.random.default_rng(1)
            a64 = rng.standard_normal((m, k))
            ah, al = to_df64(a64)
            f = jax.jit(
                lambda h, l, _s=s: df64_matmul_nt(h, l, h, l, s=_s)[0][0, 0])
            t0 = time.perf_counter()
            _ = float(f(ah, al))
            compile_s = time.perf_counter() - t0
            times = []
            for _i in range(3):
                t0 = time.perf_counter()
                _ = float(f(ah, al))
                times.append(time.perf_counter() - t0)
            t = sorted(times)[1]
            gf = 2.0 * m * n * k / t / 1e9
            emit({"kind": "gemm_micro", "m": m, "n": n, "k": k, "s": s,
                  "gflops_logical": round(gf, 1),
                  "mxu_passes": s * (s + 1) // 2,
                  "t_s": round(t, 4), "compile_s": round(compile_s, 1)})
            del ah, al
        except Exception as e:  # noqa: BLE001
            emit({"kind": "gemm_micro", "m": m, "n": n, "k": k, "s": s,
                  "error": f"{type(e).__name__}: {str(e)[:300]}"})

    # --- potrf_df64 ---------------------------------------------------------
    # reuse one big host buffer across sizes (balloon: never free big buffers)
    nmax = max(sizes)
    rng = np.random.default_rng(51)
    log(f"host-generating {nmax}x{nmax} fp64 SPD (balloon-throttled; "
        "minutes at multi-GiB)...")
    t0 = time.perf_counter()
    gbig = rng.standard_normal((nmax, nmax))
    gbig += gbig.T.copy()
    gbig *= 0.5
    gbig[np.arange(nmax), np.arange(nmax)] += nmax
    log(f"host gen: {time.perf_counter() - t0:.1f}s")

    for n in sizes:
        a = gbig[:n, :n]
        # the principal submatrix keeps SPD only if diagonally dominant
        # enough; the +nmax bump dominates every row sum scale, fine.
        ah, al = to_df64(a)
        _ = float(ah[0, 0]); _ = float(al[0, 0])
        for s, nb in ((6, 1024), (7, 1024)):
            tag = f"potrf_df64 N={n} nb={nb} s={s}"
            try:
                t0 = time.perf_counter()
                lh, ll = potrf_df64(ah, al, nb=nb, s=s)
                _ = float(lh[n - 1, n - 1])
                compile_s = time.perf_counter() - t0
                log(f"[{tag}] compile+first: {compile_s:.1f}s")
                times = []
                for _i in range(3):
                    t0 = time.perf_counter()
                    lh, ll = potrf_df64(ah, al, nb=nb, s=s)
                    _ = float(lh[n - 1, n - 1])
                    times.append(time.perf_counter() - t0)
                    log(f"[{tag}] iter: {times[-1]:.3f}s -> "
                        f"{n**3 / 3 / times[-1] / 1e9:.1f} GF/s")
                t = sorted(times)[1]
                gf = n**3 / 3 / t / 1e9
                row = {"kind": "potrf_df64", "n": n, "nb": nb, "s": s,
                       "gflops": round(gf, 1), "t_s": round(t, 3),
                       "vs_reference_fp64": round(
                           gf / BASELINE_FP64_GFLOPS, 1),
                       "compile_s": round(compile_s, 1)}
                try:
                    # row-chunked df64 residual at the SAME s (a first-cut
                    # monolithic version crashed the compile helper at
                    # N=8192 and floored at its own s=6 method error)
                    row["residual_device_df64"] = float(
                        residual_potrf_df64(ah, al, lh, ll, s=s))
                except Exception as e:  # noqa: BLE001
                    row["residual_error"] = f"{type(e).__name__}: {str(e)[:200]}"
                if n <= 8192:
                    # exact recombination on host: hi + lo in fp64
                    l64 = (np.asarray(lh, np.float64)
                           + np.asarray(ll, np.float64))
                    r = np.abs(a - l64 @ l64.T).sum(1).max()
                    row["residual_host_fp64"] = float(
                        r / np.abs(a).sum(1).max())
                gate_val = row.get(
                    "residual_host_fp64", row.get("residual_device_df64"))
                if gate_val is not None:
                    row["gate_1e10"] = "PASS" if gate_val < 1e-10 else "FAIL"
                emit(row)
                del lh, ll
            except Exception as e:  # noqa: BLE001 — log and continue
                emit({"kind": "potrf_df64", "n": n, "nb": nb, "s": s,
                      "error": f"{type(e).__name__}: {e}"})
        del ah, al
    log("df64 probe complete")


if __name__ == "__main__":
    main()
