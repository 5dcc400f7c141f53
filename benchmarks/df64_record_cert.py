"""r5 record certification: measured residuals on the df64 record runs.

The r4 frontier records carried only a law bound (VERDICT r4 weak #1):
every certification path either unpacked the packed factor to a dense
pair (2x resident) or needed a dense A plane alongside — both
RESOURCE_EXHAUSTED at the record sizes. The r5 gates remove both
obstructions (algos/potrf_df64.py):

- ``freivalds_packed_df64``: the L(L^T x) matvec runs DIRECTLY off the
  packed column-slab pair (one fori program over a tile descriptor
  table), and A — the seeded exactly-fp32 generator matrix the frontier
  probes factor — is streamed strip-wise from its seed;
- ``freivalds_potrf_df64_gen``: same A-streaming for the dense pair.

This probe re-runs the record configurations (packed N=40960, dense
N=32768 — results_r4/df64_probe.jsonl) and attaches a MEASURED
streaming-df64-Freivalds residual to each (the reference's gate is
<=1e-10, v6_test.c:87).

Run:  setsid nohup python benchmarks/df64_record_cert.py \
        > benchmarks/results_r5/df64_record_cert.log 2>&1 &
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
    from dla_tpu.algos.potrf_df64 import (
        freivalds_packed_df64,
        freivalds_potrf_df64_gen,
        potrf_df64,
        potrf_packed_df64,
    )
    from dla_tpu.ops import plgsy

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup: {time.perf_counter() - t0:.1f}s")

    s = int(os.environ.get("DF64RC_S", 7))
    nb = int(os.environ.get("DF64RC_NB", 1024))
    iters = int(os.environ.get("DF64RC_ITERS", 3))
    packed_sizes = [int(x) for x in os.environ.get(
        "DF64RC_PACKED", "40960").split(",") if x]
    dense_sizes = [int(x) for x in os.environ.get(
        "DF64RC_DENSE", "32768").split(",") if x]
    # DF64RC_BLOCKED=1: certify the dense runs with the v6_test-exact
    # block-tiled FULL reconstruction residual, A streamed from its seed
    # (r5 gen mode) instead of the Freivalds probe
    blocked = os.environ.get("DF64RC_BLOCKED", "0") == "1"

    # ---- packed records: factor off plgsy_packed, certify off the
    # packed pair with A streamed from its seed ----
    fac_p = jax.jit(
        potrf_packed_df64,
        static_argnames=("n", "nb", "ktb", "refine", "s", "w",
                         "precise_deg"),
        donate_argnums=(0, 1),
    )
    for n in packed_sizes:
        tag = f"packed-df64 N={n} s={s} nb={nb}"
        try:
            gen = jax.jit(lambda _n=n: plgsy_packed(
                _n, nb, bump=float(_n), seed=51, dtype=jnp.float32))
            zeros = jax.jit(jnp.zeros_like)

            def fresh(_gen=gen, _z=zeros):
                h = _gen()
                return h, _z(h)

            aph, apl = fresh()
            _ = float(aph[0, 0])
            t0 = time.perf_counter()
            lph, lpl = fac_p(aph, apl, n, nb, ktb=min(512, nb), s=s)
            _ = float(lph[n // nb, 0])
            compile_s = time.perf_counter() - t0
            log(f"[{tag}] compile+first: {compile_s:.1f}s")
            times = []
            for _i in range(iters):
                lph = lpl = None
                aph, apl = fresh()
                _ = float(aph[0, 0])
                t0 = time.perf_counter()
                lph, lpl = fac_p(aph, apl, n, nb, ktb=min(512, nb), s=s)
                _ = float(lph[n // nb, 0])
                times.append(time.perf_counter() - t0)
                log(f"[{tag}] iter: {times[-1]:.3f}s -> "
                    f"{n**3 / 3 / times[-1] / 1e9:.1f} GF/s")
            t = sorted(times)[len(times) // 2]
            gf = n**3 / 3 / t / 1e9
            row = {"kind": "df64_packed_record_cert", "n": n, "s": s,
                   "nb": nb, "input": "plgsy-f32-exact-packed",
                   "gflops": round(gf, 1), "t_s": round(t, 3),
                   "vs_reference_fp64": round(gf / BASELINE_FP64_GFLOPS, 1)}
            t0 = time.perf_counter()
            fr = float(freivalds_packed_df64(
                lph, lpl, n, nb, gen_seed=51, bump=float(n), s=s,
                row_chunk=min(1024, n)))
            row["freivalds_df64"] = fr
            row["gate_1e10"] = "PASS" if fr < 1e-10 else "FAIL"
            row["cert_s"] = round(time.perf_counter() - t0, 1)
            row["cert"] = "packed-native streaming df64 Freivalds (no unpack, A from seed)"
            emit(row)
            lph = lpl = aph = apl = None
        except Exception as e:  # noqa: BLE001
            emit({"kind": "df64_packed_record_cert", "n": n, "s": s,
                  "error": f"{type(e).__name__}: {str(e)[:300]}"})

    # ---- dense record: donated-pair factor, A-streamed Freivalds ----
    for n in dense_sizes:
        tag = f"dense-df64 N={n} s={s} nb={nb}"
        try:
            gen_d = jax.jit(lambda _n=n: plgsy(
                _n, bump=float(_n), seed=51, dtype=jnp.float32))
            zeros = jax.jit(jnp.zeros_like)
            fac_d = jax.jit(
                lambda h, l: potrf_df64(h, l, nb=nb, s=s,
                                        trailing="pallas", tb=min(512, nb)),
                donate_argnums=(0, 1))

            def fresh_d(_g=gen_d, _z=zeros):
                h = _g()
                return h, _z(h)

            ah, al = fresh_d()
            _ = float(ah[0, 0])
            t0 = time.perf_counter()
            lh, ll = fac_d(ah, al)
            _ = float(lh[n - 1, n - 1])
            compile_s = time.perf_counter() - t0
            log(f"[{tag}] compile+first: {compile_s:.1f}s")
            times = []
            for _i in range(iters):
                lh = ll = None
                ah, al = fresh_d()
                _ = float(ah[0, 0])
                t0 = time.perf_counter()
                lh, ll = fac_d(ah, al)
                _ = float(lh[n - 1, n - 1])
                times.append(time.perf_counter() - t0)
                log(f"[{tag}] iter: {times[-1]:.3f}s -> "
                    f"{n**3 / 3 / times[-1] / 1e9:.1f} GF/s")
            t = sorted(times)[len(times) // 2]
            gf = n**3 / 3 / t / 1e9
            row = {"kind": "df64_dense_record_cert", "n": n, "s": s,
                   "nb": nb, "tb": min(512, nb), "trailing": "pallas",
                   "input": "plgsy-f32-exact",
                   "gflops": round(gf, 1), "t_s": round(t, 3),
                   "vs_reference_fp64": round(gf / BASELINE_FP64_GFLOPS, 1)}
            t0 = time.perf_counter()
            if blocked:
                from dla_tpu.algos.potrf_df64 import (
                    residual_potrf_df64_blocked,
                )

                fr = residual_potrf_df64_blocked(
                    None, None, lh, ll, s=s, rc=min(2048, n),
                    gen_seed=51, bump=float(n))
                row["residual_blocked_df64"] = fr
                row["cert"] = ("v6-exact block-tiled reconstruction "
                               "residual, A streamed from seed")
            else:
                fr = float(freivalds_potrf_df64_gen(
                    lh, ll, gen_seed=51, bump=float(n), s=s,
                    row_chunk=min(1024, n)))
                row["freivalds_df64"] = fr
                row["cert"] = ("generator-streamed df64 Freivalds "
                               "(no resident A)")
            row["gate_1e10"] = "PASS" if fr < 1e-10 else "FAIL"
            row["cert_s"] = round(time.perf_counter() - t0, 1)
            emit(row)
            lh = ll = ah = al = None
        except Exception as e:  # noqa: BLE001
            emit({"kind": "df64_dense_record_cert", "n": n, "s": s,
                  "error": f"{type(e).__name__}: {str(e)[:300]}"})

    log("df64 record cert probe complete")


if __name__ == "__main__":
    main()
