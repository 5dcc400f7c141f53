"""bf16-storage split-precision factorization study (VERDICT r3 #3 /
ROADMAP #4).

Phase A — N=32768 storage-policy curve: throughput + Freivalds residual
for each (storage dtype, compute tier) policy:
  f32/high  (library default, shrink)   — headline reference point
  f32/default (1-pass bf16 MXU, shrink) — HBM-bound tier
  f32/high  via potrf_inplace           — formulation cost isolation
  bf16/default via potrf_inplace        — half the bytes: the raised-
                                          arithmetic-intensity policy
Phase B — N=65536 bf16 IN-CORE (the BASELINE north-star size: 8.6 GiB
matrix on a 15.75 GiB chip, impossible at fp32 where 2·N² alone is
34 GiB): chunked on-device generation, potrf_inplace factor, on-device
chunked Freivalds, then --solve refined analogue: posv_refined_streamed
recovers a ≤1e-10 fp64 solve residual from the bf16 factor (reference
contract v6_test.c:87 / BASELINE config 3).

Run (one TPU process at a time, unbounded — never kill an in-flight
compile):
  nohup python benchmarks/bf16_study_r3.py \
      >> benchmarks/results_r3/bf16_study.jsonl 2>> benchmarks/results_r3/bf16_study.log &
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

import jax.numpy as jnp
import numpy as np

from dla_tpu.algos import posv_refined_streamed, potrf_inplace, potrf_shrink
from dla_tpu.ops import plgsy
from dla_tpu.ops.lapack_like import plgsy_tile
from dla_tpu.validate import freivalds_device

SEED = 51
ITERS = int(os.environ.get("STUDY_ITERS", 3))
PHASE = os.environ.get("STUDY_PHASE", "AB")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def rtt_s() -> float:
    x = jnp.zeros((8, 8), jnp.float32) + 1
    _ = float(x[0, 0])
    t0 = time.perf_counter()
    for _i in range(10):
        _ = float(x[0, 0])
    return (time.perf_counter() - t0) / 10


@functools.partial(jax.jit, static_argnames=("n", "dtype_str", "row_chunk"))
def gen_big(s, *, n: int, dtype_str: str, row_chunk: int = 4096):
    """Chunked on-device plgsy: peak extra memory one (row_chunk, n) f32
    slab (a monolithic plgsy at N=65536 would materialize a 17 GiB f32
    intermediate before the bf16 cast). ``s`` perturbs the diagonal so
    chained timed repeats stay honest."""
    dtype = jnp.dtype(dtype_str)
    out = jnp.zeros((n, n), dtype)

    def body(i, out):
        r0 = i * row_chunk
        tile = plgsy_tile(SEED, r0, 0, row_chunk, n, bump=float(n),
                          dtype=jnp.float32)
        rows = r0 + jnp.arange(row_chunk)
        tile = tile + jnp.where(
            jnp.arange(n)[None, :] == rows[:, None], s, jnp.float32(0))
        return jax.lax.dynamic_update_slice(
            out, tile.astype(dtype), (r0, jnp.zeros((), jnp.int32)))

    return jax.lax.fori_loop(0, n // row_chunk, body, out)


def run_policy(label, n, factor_fn, dtype_str, *, iters=ITERS):
    """Time iters factorizations (fresh generation each, readback-timed,
    RTT-subtracted) + one Freivalds-validated factor."""
    rtt = RTT
    times = []
    t0 = time.perf_counter()
    a = gen_big(jnp.float32(0.0), n=n, dtype_str=dtype_str)
    _ = float(jnp.asarray(a[0, 0], jnp.float32))
    l = factor_fn(a)
    _ = float(jnp.asarray(l[n - 1, n - 1], jnp.float32))
    compile_s = time.perf_counter() - t0
    log(f"[{label}] gen+factor compile+first: {compile_s:.1f}s")
    for i in range(iters):
        l = None
        a = gen_big(jnp.float32((i + 1) * 1e-3), n=n, dtype_str=dtype_str)
        _ = float(jnp.asarray(a[0, 0], jnp.float32))
        t0 = time.perf_counter()
        l = factor_fn(a)
        _ = float(jnp.asarray(l[n - 1, n - 1], jnp.float32))
        dt = time.perf_counter() - t0 - rtt
        times.append(dt)
        log(f"[{label}] iter {i}: {dt:.4f}s -> {(n**3 / 3) / dt / 1e12:.2f} TF/s")
    med = sorted(times)[len(times) // 2]
    # validated factor: regenerate the UNPERTURBED matrix and refactor.
    # Drop the last timed factor FIRST — at N=65536 holding it across the
    # regeneration is 2 × 8 GiB live on a 15.75 GiB chip (the r3 OOM).
    l = None
    a = gen_big(jnp.float32(0.0), n=n, dtype_str=dtype_str)
    _ = float(jnp.asarray(a[0, 0], jnp.float32))
    l = factor_fn(a)
    res = float(freivalds_device(l, seed=SEED, probes=2, row_chunk=4096))
    gf = (n**3 / 3) / med / 1e9
    emit(label=label, n=n, storage=dtype_str, gflops=round(gf, 1),
         median_s=round(med, 4), freivalds=res, compile_s=round(compile_s, 1),
         rtt_s=round(rtt, 4))
    log(f"[{label}] {gf:.0f} GF/s, freivalds {res:.2e}")
    return l


def main():
    log(f"backend={jax.default_backend()}")
    global RTT
    RTT = rtt_s()
    log(f"rtt={RTT * 1e3:.1f} ms")

    if "A" in PHASE:
        n = 32768
        policies = [
            ("f32_high_shrink", "float32",
             jax.jit(lambda a: potrf_shrink(
                 a, nb=8192, panel="blocktrsm", trailing="pallas", tb=1024,
                 kb=256, diag_factor="twolevel", precision="high"),
                 donate_argnums=0)),
            ("f32_default_shrink", "float32",
             jax.jit(lambda a: potrf_shrink(
                 a, nb=8192, panel="blocktrsm", trailing="pallas", tb=1024,
                 kb=256, diag_factor="twolevel", precision="default"),
                 donate_argnums=0)),
            ("f32_high_inplace", "float32",
             lambda a: potrf_inplace(a, nb=8192, tb=1024, kb=256,
                                     precision="high")),
            ("bf16_default_inplace", "bfloat16",
             lambda a: potrf_inplace(a, nb=8192, tb=1024, kb=256,
                                     precision="default")),
        ]
        for label, dt, fn in policies:
            try:
                run_policy(label, n, fn, dt)
            except Exception as e:  # noqa: BLE001
                emit(label=label, error=repr(e)[:500])
                log(f"[{label}] FAILED: {repr(e)[:500]}")

    if "C" in PHASE:
        # ROADMAP r4 #2: does the 3-pass `high` arithmetic keep its residual
        # with bf16 storage? Hypothesis: no — the storage rounding
        # (~sqrt(N)·eps_bf16) dominates the compute precision, so
        # bf16/high should match bf16/default's residual class at (at best)
        # the same speed; bf16x3 splitting only exists for f32 operands.
        try:
            run_policy(
                "bf16_high_inplace", 32768,
                lambda a: potrf_inplace(a, nb=8192, tb=1024, kb=256,
                                        precision="high"),
                "bfloat16",
            )
        except Exception as e:  # noqa: BLE001
            emit(label="bf16_high_inplace", error=repr(e)[:500])
            log(f"[bf16_high_inplace] FAILED: {repr(e)[:500]}")

    if "B" in PHASE:
        n = 65536
        # the late-r3 NB-frontier sweep moved the bf16 policy's optimum to
        # NB≈4096 at N=32768; STUDY_NB re-runs phase B at the frontier NB
        nb_b = int(os.environ.get("STUDY_NB", 8192))
        kb_b = int(os.environ.get("STUDY_KB", 256))
        label = "bf16_default_inplace_n65536"
        if nb_b != 8192:
            label += f"_nb{nb_b}"
        if kb_b != 256:
            label += f"_kb{kb_b}"
        try:
            l = run_policy(
                label, n,
                lambda a: potrf_inplace(a, nb=nb_b, tb=1024, kb=kb_b,
                                        precision="default"),
                "bfloat16", iters=2,
            )
            # reference solve contract from the bf16 factor
            rng = np.random.default_rng(7)
            b = rng.standard_normal(n)
            t0 = time.perf_counter()
            x, err, used = posv_refined_streamed(
                l, b, seed=SEED, panel=4096, iters=40, tol=1e-11,
                on_iter=lambda i, e: log(f"[{label}] refine iter {i}: {e:.2e}"),
            )
            emit(label=label + "_solve", solve_err=err, iters=used,
                 solve_wall_s=round(time.perf_counter() - t0, 1),
                 gate="PASS" if err < 1e-10 else "FAIL")
            log(f"[{label}] solve err {err:.2e} in {used} iters "
                f"({'PASS' if err < 1e-10 else 'FAIL'})")
        except Exception as e:  # noqa: BLE001
            emit(label=label, error=repr(e)[:500])
            log(f"[{label}] FAILED: {repr(e)[:500]}")


if __name__ == "__main__":
    main()
