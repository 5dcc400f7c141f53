"""df64 in-core frontier probe: emulated-fp64 factorization at N beyond
the host-fp64-generation budget.

Host generation of an N=32768 fp64 SPD matrix costs ~an hour under this
VM's balloon-throttled page supply (CLAUDE.md), so frontier sizes use a
DEVICE-generated input: A = (plgsy-f32, 0) — an SPD matrix whose entries
are exactly representable in 24 bits, hence an EXACT df64 pair with
lo = 0. The fp64 factorization contract is unchanged (the factor must
reproduce THIS A to ≤1e-10 in df64; its L genuinely needs the full df64
word). Memory: the in-place pair is 8·N² bytes → N=32768 is 8 GiB
resident + panel slices, the practical dense df64 frontier on a
15.75 GiB chip (N=40960 would be 12.5 GiB + temporaries).

Run:  setsid nohup python benchmarks/df64_frontier.py \
        > benchmarks/results_r4/df64_frontier.log 2>&1 &
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

    from dla_tpu.algos.potrf_df64 import potrf_df64
    from dla_tpu.ops import plgsy

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup: {time.perf_counter() - t0:.1f}s")

    s = int(os.environ.get("DF64F_S", 7))
    sizes = [int(x) for x in os.environ.get(
        "DF64F_SIZES", "24576,32768").split(",")]
    # donate the pair: without donation XLA holds input AND output pairs
    # (2 × 2 × 4·N² bytes) and the N=24576 run OOMed HBM at runtime
    # (first-cut probe). The library-level potrf_df64 never donates (tests
    # reuse operands); the probe jits the unwrapped function with
    # donate_argnums and regenerates the (cheap, on-device) input per
    # iteration — the same pattern as the driver's inplace_regen path.
    import functools as _ft

    fac = jax.jit(
        potrf_df64.__wrapped__,
        static_argnames=("nb", "refine", "s", "w", "precise_deg",
                         "trailing_strips", "trailing", "tb"),
        donate_argnums=(0, 1),
    )
    for n in sizes:
        tag = f"df64 frontier N={n} s={s} pallas tb=512"
        try:
            gen = jax.jit(
                lambda _n=n: plgsy(_n, bump=float(_n), seed=51,
                                   dtype=jnp.float32))
            zeros = jax.jit(jnp.zeros_like)

            def fresh(_gen=gen, _z=zeros):
                h = _gen()
                return h, _z(h)

            ah, al = fresh()
            _ = float(ah[0, 0])
            t0 = time.perf_counter()
            lh, ll = fac(ah, al, nb=1024, s=s, trailing="pallas", tb=512)
            _ = float(lh[n - 1, n - 1])
            compile_s = time.perf_counter() - t0
            log(f"[{tag}] compile+first: {compile_s:.1f}s")
            times = []
            for _i in range(3):
                lh = ll = None
                ah, al = fresh()  # un-timed (reference times dpotrf only)
                _ = float(ah[0, 0])
                t0 = time.perf_counter()
                lh, ll = fac(ah, al, nb=1024, s=s,
                             trailing="pallas", tb=512)
                _ = float(lh[n - 1, n - 1])
                times.append(time.perf_counter() - t0)
                log(f"[{tag}] iter: {times[-1]:.3f}s -> "
                    f"{n**3 / 3 / times[-1] / 1e9:.1f} GF/s")
            t = sorted(times)[1]
            gf = n**3 / 3 / t / 1e9
            row = {"kind": "df64_frontier", "n": n, "s": s,
                   "trailing": "pallas", "tb": 512,
                   "input": "plgsy-f32-exact",
                   "gflops": round(gf, 1), "t_s": round(t, 3),
                   "vs_reference_fp64": round(gf / BASELINE_FP64_GFLOPS, 1),
                   "compile_s": round(compile_s, 1)}
            try:
                # streaming df64 Freivalds — the frontier-size residual
                # certification (O(n²) matvecs, strip-bounded slices;
                # al=None: A is exactly fp32, no (n,n) zeros plane needed)
                from dla_tpu.algos.potrf_df64 import freivalds_potrf_df64

                ah = gen()  # the timed runs donated every input pair
                _ = float(ah[0, 0])
                fr = float(freivalds_potrf_df64(lh, ll, ah, None, s=s))
                row["freivalds_df64"] = fr
                row["gate_1e10"] = "PASS" if fr < 1e-10 else "FAIL"
            except Exception as e:  # noqa: BLE001
                row["freivalds_error"] = f"{type(e).__name__}: {str(e)[:200]}"
            emit(row)
            ah = al = lh = ll = None
        except Exception as e:  # noqa: BLE001
            emit({"kind": "df64_frontier", "n": n, "s": s,
                  "error": f"{type(e).__name__}: {str(e)[:300]}"})
    log("df64 frontier probe complete")


if __name__ == "__main__":
    main()
