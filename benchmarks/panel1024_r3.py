"""Attribute the remaining ~19% MFU gap at the r3 headline frontier
config (N=32768, NB=1024, kb=full-K, `high` tier, inplace formulation —
51.0 TF/s of the 63 TF/s ceiling, results_r3/bench_headline_51tf.json).

Per step the inplace loop does: diag factor (nb=1024 twolevel) →
blocktrsm panel solve (height h) → aliased trailing update. This probe
times each phase at sampled heights on the real chip, then integrates
over the 32 steps to estimate each phase's share of the end-to-end time
— the NB=1024 analogue of `breakdown_r3.py` (which attributed the
NB=8192 shrink config; reference analogue: the per-op FLOP accounting in
`worker_distrib.cpp:247-519`).

Compile-lean: iota-derived inputs only, one small jitted fn per phase.

Run (one TPU process at a time):
  python benchmarks/panel1024_r3.py \
      >> benchmarks/results_r3/panel1024.jsonl 2>> benchmarks/results_r3/panel1024.log
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
os.environ.setdefault("DLA_TPU_MATMUL_PRECISION", PREC)

import jax

if os.environ.get("PB_PLATFORM"):  # e.g. cpu smoke (sitecustomize pins axon)
    jax.config.update("jax_platforms", os.environ["PB_PLATFORM"])

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from dla_tpu.algos.potrf import _blocktrsm_panel, _chol_twolevel
from dla_tpu.kernels.pallas_tiles import trailing_update_lower

N = int(os.environ.get("PB_N", 32768))
NB = int(os.environ.get("PB_NB", 1024))
TB = int(os.environ.get("PB_TB", 1024))
KB = int(os.environ.get("PB_KB", NB))  # full-K = the frontier setting
ITERS = int(os.environ.get("PB_ITERS", 4))
HEIGHTS = tuple(
    int(h) for h in os.environ.get(
        "PB_HEIGHTS", "30720,22528,14336,6144").split(",")
)
# also time the shipping aliased/origin-windowed trailing variant (full
# (N, N) buffer, donated) at each height — the potrf_inplace call path
ALIAS_FULL = os.environ.get("PB_ALIAS_FULL", "1") == "1"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    kw.update(prec=PREC, n=N, nb=NB, tb=TB, kb=KB)
    print(json.dumps(kw), flush=True)


def rtt_s() -> float:
    x = jnp.zeros((8, 8), jnp.float32) + 1
    _ = float(x[0, 0])
    t0 = time.perf_counter()
    for _i in range(10):
        _ = float(x[0, 0])
    return (time.perf_counter() - t0) / 10


def mat(m, w, scale=1e-3, diag=None):
    r = jax.lax.broadcasted_iota(jnp.float32, (m, w), 0)
    c = jax.lax.broadcasted_iota(jnp.float32, (m, w), 1)
    x = jnp.sin(r * 0.7 + c * 1.3) * scale
    if diag is not None:
        idx = jnp.arange(min(m, w))
        x = x.at[idx, idx].add(diag)
    return x


def timed_chain(label, fn, x0, *, flops, iters=ITERS):
    if flops / 40e12 * iters < 4 * 0.03:  # cheap phase: don't let 4 calls
        iters = max(iters, 32)            # disappear under one tunnel RTT
    t_all0 = time.perf_counter()
    try:
        x = fn(x0)
        _ = float(jnp.asarray(x).ravel()[0])
        compile_s = time.perf_counter() - t_all0
        # keep chaining from the warm-up result (x0 may have been donated)
        t0 = time.perf_counter()
        for _i in range(iters):
            x = fn(x)
        _ = float(jnp.asarray(x).ravel()[0])
        wall = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001
        emit(label=label, error=repr(e)[:600])
        log(f"{label} FAILED: {repr(e)[:600]}")
        return None
    per = (wall - RTT) / iters
    emit(label=label, per_call_s=round(per, 6),
         gflops=round(flops / per / 1e9, 1), compile_s=round(compile_s, 1))
    log(f"{label}: {per * 1e3:.2f} ms  {flops / per / 1e12:.2f} TF/s "
        f"(compile {compile_s:.0f}s)")
    return per


def main():
    log(f"backend={jax.default_backend()} prec={PREC} "
        f"N={N} NB={NB} tb={TB} kb={KB} heights={HEIGHTS}")
    global RTT
    RTT = rtt_s()
    log(f"rtt={RTT * 1e3:.1f} ms")

    # --- diag factor at nb (one per step) ---
    d0 = jax.jit(lambda: mat(NB, NB, scale=1e-3, diag=float(NB) * 1e-3))()
    d0 = jax.jit(
        lambda d: 0.5 * (d + d.T) + 8.0 * jnp.eye(NB, dtype=jnp.float32)
    )(d0)
    _ = float(d0[0, 0])
    # scale the carry INSIDE the jit: an eager `s * 1e-6` between calls is
    # an op-by-op dispatch through the axon tunnel (~1 RTT each) that
    # inflated this phase 30x in the first probe run
    fdiag = jax.jit(lambda s: _chol_twolevel(
        d0 + (s * 1e-6) * jnp.eye(NB, dtype=jnp.float32))[NB - 1, NB - 1])
    t0 = time.perf_counter()
    s = jnp.float32(0.0)
    _ = float(fdiag(s))
    compile_s = time.perf_counter() - t0
    diag_iters = max(ITERS, 16)
    t0 = time.perf_counter()
    for _i in range(diag_iters):
        s = fdiag(s)
    _ = float(s)
    t_diag = (time.perf_counter() - t0 - RTT) / diag_iters
    emit(label="diag", per_call_s=round(t_diag, 6),
         gflops=round((NB**3 / 3) / t_diag / 1e9, 1),
         compile_s=round(compile_s, 1))
    log(f"diag: {t_diag * 1e3:.2f} ms")

    # --- panel solve + trailing at sampled heights ---
    lkk = jax.jit(lambda: jnp.tril(mat(NB, NB, scale=1e-3, diag=2.0)))()
    _ = float(lkk[0, 0])
    t_solve, t_trail, t_alias = {}, {}, {}
    for h in HEIGHTS:
        b = jax.jit(lambda h=h: mat(h, NB, scale=1e-2))()
        _ = float(b[0, 0])
        t_solve[h] = timed_chain(
            f"blocktrsm_h{h}", jax.jit(lambda x: _blocktrsm_panel(lkk, x)),
            b, flops=float(h) * NB * NB)
        c = jax.jit(lambda h=h: mat(h, h))()
        p = jax.jit(lambda h=h: mat(h, NB, scale=1e-2))()
        _ = float(c[0, 0]); _ = float(p[0, 0])
        nt = h // TB
        npairs = nt * (nt + 1) // 2
        fn = jax.jit(lambda x, p=p: trailing_update_lower(
            x, p, tb=TB, kb=min(KB, NB), alias=False,
            vmem_limit_bytes=100 * 2**20))
        t_trail[h] = timed_chain(
            f"trailing_h{h}", fn, c, flops=2.0 * npairs * TB * TB * NB)
        del c
        # the SHIPPING variant: aliased in-place window update on the full
        # (N, N) buffer (potrf_inplace's call, potrf.py:423-426). alias=True
        # serializes writeback against the next block's prefetch (the
        # trailing_update_lower docstring's ~20% note was measured at r2
        # shapes); time it directly at the frontier shapes so the
        # integrated attribution reflects the real path.
        if ALIAS_FULL:
            origin = (N - h) // TB
            cf = jax.jit(lambda: mat(N, N))()
            _ = float(cf[0, 0])
            fa = jax.jit(lambda x, p=p, o=origin: trailing_update_lower(
                x, p, tb=TB, kb=min(KB, NB), alias=True, origin=o,
                vmem_limit_bytes=100 * 2**20), donate_argnums=0)
            t_alias[h] = timed_chain(
                f"trailing_alias_h{h}", fa, cf,
                flops=2.0 * npairs * TB * TB * NB)
            if h == HEIGHTS[0]:
                cf = jax.jit(lambda: mat(N, N))()
                _ = float(cf[0, 0])
                fs = jax.jit(lambda x, p=p, o=origin: trailing_update_lower(
                    x, p, tb=TB, kb=min(KB, NB), alias=True, origin=o,
                    vmem_limit_bytes=100 * 2**20,
                    dimension_semantics=("arbitrary", "arbitrary")),
                    donate_argnums=0)
                timed_chain(f"trailing_alias_sem_h{h}", fs, cf,
                            flops=2.0 * npairs * TB * TB * NB)
            del cf

    # --- integrate over the N/NB steps (linear interp in h) ---
    def interp(table, h):
        pts = sorted((k, v) for k, v in table.items() if v is not None)
        if not pts:
            return None
        if h <= pts[0][0]:
            return pts[0][1] * h / pts[0][0]
        if h >= pts[-1][0]:
            return pts[-1][1] * (h / pts[-1][0]) ** 2  # trailing ~ h²
        for (h0, v0), (h1, v1) in zip(pts, pts[1:]):
            if h0 <= h <= h1:
                return v0 + (v1 - v0) * (h - h0) / (h1 - h0)

    nsteps = N // NB
    flops = N**3 / 3
    trail_tables = [("trail_noalias", t_trail)]
    if any(v is not None for v in t_alias.values()):
        trail_tables.append(("trail_alias", t_alias))
    for tname, ttable in trail_tables:
        tot = {"diag": t_diag * nsteps, "solve": 0.0, tname: 0.0}
        for k in range(nsteps):
            h = N - (k + 1) * NB
            if h <= 0:
                continue
            tot["solve"] += interp(t_solve, h) or 0.0
            tot[tname] += interp(ttable, h) or 0.0
        total = sum(tot.values())
        emit(label=f"integrated_{tname}",
             seconds={k: round(v, 3) for k, v in tot.items()},
             total_s=round(total, 3),
             shares={k: round(v / total, 3) for k, v in tot.items()},
             implied_gflops=round(flops / total / 1e9, 1))
        log(f"integrated[{tname}]: {tot} → {flops / total / 1e12:.1f} TF/s "
            f"implied")


if __name__ == "__main__":
    main()
