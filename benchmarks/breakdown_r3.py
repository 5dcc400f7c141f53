"""Round-3 headline breakdown (VERDICT r3 #1): time each phase of the
shipping config (N=32768, NB=8192, `high` tier, shrink/blocktrsm/pallas)
separately on the real chip, so the MFU gap (36.7 vs 63 TF/s ceiling) is
attributed to a phase before optimizing.

Compile-lean by design: all inputs are iota-derived (no plgsy programs —
a standalone plgsy(24576²) remote compile wedged for 2h in the first
attempt), and each phase is one small jitted function timed by chaining.

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
PHASES = os.environ.get("BD_PHASES", "trailing,blocktrsm,diag,tril").split(",")

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from dla_tpu.algos.potrf import _blocktrsm_panel, _chol_twolevel
from dla_tpu.kernels.pallas_tiles import trailing_update_lower

NB = 8192
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


def mat(m, w, scale=1e-3, diag=None):
    """Cheap deterministic well-scaled (m, w) fp32 matrix (compiles to a
    couple of fused iota ops; values in [-0.5, 0.5] + optional diag)."""
    r = jax.lax.broadcasted_iota(jnp.float32, (m, w), 0)
    c = jax.lax.broadcasted_iota(jnp.float32, (m, w), 1)
    x = jnp.sin(r * 0.7 + c * 1.3) * scale
    if diag is not None:
        idx = jnp.arange(min(m, w))
        x = x.at[idx, idx].add(diag)
    return x


def timed_chain(label: str, fn, x0, *, flops: float, iters: int = ITERS):
    t_all0 = time.perf_counter()
    try:
        x = fn(x0)
        _ = float(jnp.asarray(x).ravel()[0])
        compile_s = time.perf_counter() - t_all0
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
    log(f"backend={jax.default_backend()} prec={PREC} phases={PHASES}")
    global RTT
    RTT = rtt_s()
    log(f"rtt={RTT * 1e3:.1f} ms")

    if "trailing" in PHASES:
        for m, variants in ((24576, True), (16384, False), (8192, False)):
            c = jax.jit(lambda m=m: mat(m, m))()
            p = jax.jit(lambda m=m: mat(m, NB, scale=1e-2))()
            _ = float(c[0, 0]); _ = float(p[0, 0])
            cfgs = [(1024, 256)]
            if variants:
                cfgs += [(2048, 256), (1024, 512), (512, 256)]
            for tb, kb in cfgs:
                nt = m // tb
                npairs = nt * (nt + 1) // 2
                flops = 2 * npairs * tb * tb * NB
                fn = jax.jit(lambda x, p=p, tb=tb, kb=kb: trailing_update_lower(
                    x, p, tb=tb, kb=kb, alias=False,
                    vmem_limit_bytes=100 * 2**20))
                timed_chain(f"trailing_m{m}_tb{tb}_kb{kb}", fn, c, flops=flops)

    if "blocktrsm" in PHASES:
        lkk = jax.jit(lambda: jnp.tril(mat(NB, NB, scale=1e-3, diag=2.0)))()
        _ = float(lkk[0, 0])
        for m in (24576, 16384, 8192):
            b = jax.jit(lambda m=m: mat(m, NB, scale=1e-2))()
            _ = float(b[0, 0])
            fn = jax.jit(lambda x: _blocktrsm_panel(lkk, x))
            timed_chain(f"blocktrsm_m{m}", fn, b, flops=float(m) * NB * NB)

    if "diag" in PHASES:
        d0 = jax.jit(lambda: mat(NB, NB, scale=1e-3, diag=float(NB) * 1e-3))()
        d0 = jax.jit(lambda d: 0.5 * (d + d.T) + 8.0 * jnp.eye(NB, dtype=jnp.float32))(d0)
        _ = float(d0[0, 0])
        fdiag = jax.jit(lambda s: _chol_twolevel(
            d0 + s * jnp.eye(NB, dtype=jnp.float32))[NB - 1, NB - 1])
        t0 = time.perf_counter()
        s = jnp.float32(0.0)
        _ = float(fdiag(s))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _i in range(ITERS):
            s = fdiag(s * 1e-6)
        _ = float(s)
        per = (time.perf_counter() - t0 - RTT) / ITERS
        emit(label="diag_twolevel_8192", per_call_s=round(per, 5),
             gflops=round((NB**3 / 3) / per / 1e9, 1), compile_s=round(compile_s, 1))
        log(f"diag_twolevel_8192: {per * 1e3:.1f} ms {(NB**3 / 3) / per / 1e12:.1f} TF/s")

    if "tril" in PHASES:
        n = 32768
        a = jax.jit(lambda: mat(n, n))()
        _ = float(a[0, 0])
        timed_chain("tril_32768", jax.jit(jnp.tril), a, flops=1.0)


if __name__ == "__main__":
    main()
