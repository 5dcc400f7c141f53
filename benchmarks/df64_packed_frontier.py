"""packed × df64 frontier probe: emulated-fp64 factorization on
triangle-only storage — the √2 frontier extension over the dense pair.

The dense df64 pair is 8·N² bytes (N=32768 = 8 GiB, the measured dense
frontier); the packed pair is ≈ 4·N² (N=49152 = 9.2 GiB on a 15.75 GiB
chip). Input is the device-generated exactly-fp32 packed SPD triangle
(``plgsy_packed``, lo = 0) — the same exact-pair contract as the dense
frontier probe (benchmarks/df64_frontier.py). Gate strategy mirrors the
dense probe: the full streaming-df64-Freivalds certification runs at the
largest size where the UNPACKED pair + dense A co-reside (N=24576);
above that the confirmed n·2^(−s·w) residual law bounds the factor
(s=7: ~3e-12 at N=49152, 30× under the 1e-10 gate).

Run:  setsid nohup python benchmarks/df64_packed_frontier.py \
        > benchmarks/results_r4/df64_packed_frontier.log 2>&1 &
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

    from dla_tpu.algos.packed import plgsy_packed, unpack_tri
    from dla_tpu.algos.potrf_df64 import potrf_packed_df64

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup: {time.perf_counter() - t0:.1f}s")

    s = int(os.environ.get("DF64PF_S", 7))
    nb = int(os.environ.get("DF64PF_NB", 1024))
    ktb = int(os.environ.get("DF64PF_KTB", 512))
    sizes = [int(x) for x in os.environ.get(
        "DF64PF_SIZES", "24576,32768,40960,49152").split(",")]
    gate_max = int(os.environ.get("DF64PF_GATE_MAX", 24576))

    fac = jax.jit(
        potrf_packed_df64,
        static_argnames=("n", "nb", "ktb", "refine", "s", "w",
                         "precise_deg"),
        donate_argnums=(0, 1),
    )
    for n in sizes:
        tag = f"packed-df64 N={n} s={s} nb={nb} ktb={ktb}"
        try:
            gen = jax.jit(
                lambda _n=n: plgsy_packed(
                    _n, nb, bump=float(_n), seed=51, dtype=jnp.float32))
            zeros = jax.jit(jnp.zeros_like)

            def fresh(_gen=gen, _z=zeros):
                h = _gen()
                return h, _z(h)

            aph, apl = fresh()
            _ = float(aph[0, 0])
            t0 = time.perf_counter()
            lph, lpl = fac(aph, apl, n, nb, ktb=ktb, s=s)
            _ = float(lph[n // nb, 0])
            compile_s = time.perf_counter() - t0
            log(f"[{tag}] compile+first: {compile_s:.1f}s")
            times = []
            for _i in range(3):
                lph = lpl = None
                aph, apl = fresh()  # un-timed (reference times dpotrf only)
                _ = float(aph[0, 0])
                t0 = time.perf_counter()
                lph, lpl = fac(aph, apl, n, nb, ktb=ktb, s=s)
                _ = float(lph[n // nb, 0])
                times.append(time.perf_counter() - t0)
                log(f"[{tag}] iter: {times[-1]:.3f}s -> "
                    f"{n**3 / 3 / times[-1] / 1e9:.1f} GF/s")
            t = sorted(times)[1]
            gf = n**3 / 3 / t / 1e9
            row = {"kind": "df64_packed_frontier", "n": n, "s": s,
                   "nb": nb, "ktb": ktb, "input": "plgsy-f32-exact-packed",
                   "pair_gib": round(8 * n * (n + nb) / 2 / 2**30, 2),
                   "gflops": round(gf, 1), "t_s": round(t, 3),
                   "vs_reference_fp64": round(gf / BASELINE_FP64_GFLOPS, 1),
                   "compile_s": round(compile_s, 1)}
            if n <= gate_max:
                try:
                    # unpack the pair, free packed state, regenerate dense
                    # A on device, stream the df64 Freivalds gate
                    from dla_tpu.algos.potrf_df64 import freivalds_potrf_df64
                    from dla_tpu.ops import plgsy

                    unp = jax.jit(unpack_tri, static_argnames=("n", "tb"))
                    lh = unp(lph, n=n, tb=nb)
                    ll = unp(lpl, n=n, tb=nb)
                    _ = float(lh[n - 1, n - 1])
                    lph = lpl = aph = apl = None
                    ah = jax.jit(lambda: plgsy(
                        n, bump=float(n), seed=51, dtype=jnp.float32))()
                    _ = float(ah[0, 0])
                    fr = float(freivalds_potrf_df64(lh, ll, ah, None, s=s))
                    row["freivalds_df64"] = fr
                    row["gate_1e10"] = "PASS" if fr < 1e-10 else "FAIL"
                    lh = ll = ah = None
                except Exception as e:  # noqa: BLE001
                    row["freivalds_error"] = (
                        f"{type(e).__name__}: {str(e)[:200]}")
            else:
                row["residual_law_bound"] = float(n * 2.0 ** (-s * 8))
            emit(row)
            aph = apl = lph = lpl = None
        except Exception as e:  # noqa: BLE001
            emit({"kind": "df64_packed_frontier", "n": n, "s": s,
                  "error": f"{type(e).__name__}: {str(e)[:300]}"})
    log("packed df64 frontier probe complete")


if __name__ == "__main__":
    main()
