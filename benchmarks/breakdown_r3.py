"""Round-3 headline breakdown (VERDICT r3 #1): time each phase of the
shipping config (N=32768, NB=8192, `high` tier, shrink/blocktrsm/pallas)
separately on the real chip, so the MFU gap (36.7 vs 63 TF/s ceiling) is
attributed to a phase before optimizing.

Also probes trailing-kernel variants (tb/kb/dimension_semantics) at the
shipping sizes — kernel-local wins have lost end-to-end here before
(docs/ROADMAP.md), so the decision metric stays bench.py, but this narrows
the search.

Run (one TPU process at a time):
  DLA_TPU_MATMUL_PRECISION=high python benchmarks/breakdown_r3.py \
      >> benchmarks/results_r3/breakdown.jsonl 2>> benchmarks/results_r3/breakdown.log
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

PREC = os.environ.get("DLA_TPU_MATMUL_PRECISION", "high")

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from dla_tpu.algos.potrf import _blocktrsm_panel, _chol_twolevel
from dla_tpu.kernels.pallas_tiles import trailing_update_lower
from dla_tpu.ops import plgsy

N, NB = 32768, 8192
ITERS = 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    kw["prec"] = PREC
    print(json.dumps(kw), flush=True)


def rtt_s() -> float:
    x = jnp.zeros((8, 8), jnp.float32) + 1
    _ = float(x[0, 0])
    t0 = time.perf_counter()
    for _i in range(10):
        _ = float(x[0, 0])
    return (time.perf_counter() - t0) / 10


def timed_chain(label: str, fn, x0, *, flops: float, iters: int = ITERS):
    """Warm-up once (compile), then time `iters` chained calls x=fn(x) with
    one scalar readback at the end; per-call = (wall - rtt)/iters."""
    try:
        t0 = time.perf_counter()
        x = fn(x0)
        _ = float(jnp.asarray(x).ravel()[0])
        compile_s = time.perf_counter() - t0
        x = x0
        t0 = time.perf_counter()
        for _i in range(iters):
            x = fn(x)
        _ = float(jnp.asarray(x).ravel()[0])
        wall = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001
        emit(label=label, error=repr(e)[:600])
        log(f"{label} FAILED: {repr(e)[:600]}")
        return
    per = (wall - RTT) / iters
    emit(label=label, per_call_s=round(per, 5), gflops=round(flops / per / 1e9, 1),
         compile_s=round(compile_s, 1), iters=iters)
    log(f"{label}: {per * 1e3:.1f} ms  {flops / per / 1e12:.1f} TF/s (compile {compile_s:.0f}s)")


def main():
    log(f"backend={jax.default_backend()} prec={PREC}")
    global RTT
    RTT = rtt_s()
    log(f"rtt={RTT * 1e3:.1f} ms")
    key = 0

    # ---- full factorization anchor -----------------------------------------
    from dla_tpu.algos import potrf_shrink

    a = jax.jit(lambda: plgsy(N, bump=float(N), seed=51, dtype=jnp.float32))()
    _ = float(a[0, 0])
    full = jax.jit(lambda x: potrf_shrink(
        x, nb=NB, panel="blocktrsm", trailing="pallas", tb=1024, kb=256,
        diag_factor="twolevel", precision=PREC))
    timed_chain("full_shrink_nb8192", lambda x: full(x), a,
                flops=N**3 / 3, iters=2)

    # ---- phase: trailing update at the three shipping sizes ----------------
    for m in (24576, 16384, 8192):
        c = jax.jit(lambda m=m: plgsy(m, bump=float(m), seed=7, dtype=jnp.float32))()
        p = jax.jit(lambda m=m: plgsy(m, bump=float(m), seed=9, dtype=jnp.float32)[:, :NB])()
        _ = float(c[0, 0]); _ = float(p[0, 0])
        nt = m // 1024
        npairs = nt * (nt + 1) // 2
        flops = 2 * npairs * 1024 * 1024 * NB
        fn = jax.jit(lambda x, p=p: trailing_update_lower(
            x, p, tb=1024, kb=256, alias=False, vmem_limit_bytes=100 * 2**20))
        timed_chain(f"trailing_m{m}_tb1024_kb256", fn, c, flops=flops)

        # variants at the biggest size only (decision: does a better point exist?)
        if m == 24576:
            for tb, kb, sem in ((2048, 256, None), (1024, 512, None),
                                (2048, 512, None),
                                (1024, 256, ("arbitrary", "arbitrary")),
                                (512, 256, None)):
                if m % tb:
                    continue
                ntv = m // tb
                npv = ntv * (ntv + 1) // 2
                fl = 2 * npv * tb * tb * NB
                fnv = jax.jit(lambda x, p=p, tb=tb, kb=kb, sem=sem:
                              trailing_update_lower(
                                  x, p, tb=tb, kb=kb, alias=False,
                                  vmem_limit_bytes=100 * 2**20,
                                  dimension_semantics=sem))
                timed_chain(f"trailing_m{m}_tb{tb}_kb{kb}"
                            + ("_sem" if sem else ""), fnv, c, flops=fl)

    # ---- phase: blocktrsm panel solve --------------------------------------
    dk = jax.jit(lambda: plgsy(NB, bump=float(NB), seed=3, dtype=jnp.float32))()
    lkk = jax.jit(lambda d: jnp.tril(jnp.linalg.cholesky(d)))(dk)
    _ = float(lkk[0, 0])
    for m in (24576, 16384, 8192):
        b = jax.jit(lambda m=m: plgsy(m, bump=float(m), seed=11, dtype=jnp.float32)[:, :NB])()
        _ = float(b[0, 0])
        fn = jax.jit(lambda x: _blocktrsm_panel(lkk, x))
        timed_chain(f"blocktrsm_m{m}", fn, b, flops=float(m) * NB * NB)

    # ---- phase: diagonal factor (twolevel) ---------------------------------
    eye_scale = jnp.float32(1e-6)
    d0 = dk
    fdiag = jax.jit(lambda s: _chol_twolevel(
        d0 + s * jnp.eye(NB, dtype=jnp.float32))[NB - 1, NB - 1])
    t0 = time.perf_counter()
    s = eye_scale
    _ = float(fdiag(s))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(ITERS):
        s = fdiag(s * 1e-3 + eye_scale)  # chain through the scalar
    _ = float(s)
    per = (time.perf_counter() - t0 - RTT) / ITERS
    emit(label="diag_twolevel_8192", per_call_s=round(per, 5),
         gflops=round((NB**3 / 3) / per / 1e9, 1), compile_s=round(compile_s, 1))
    log(f"diag_twolevel_8192: {per * 1e3:.1f} ms {(NB**3 / 3) / per / 1e12:.1f} TF/s")

    # ---- scaffold: tril over the full matrix -------------------------------
    ftril = jax.jit(jnp.tril)
    timed_chain("tril_32768", ftril, a, flops=0.0 + 1)

    del key


if __name__ == "__main__":
    main()
