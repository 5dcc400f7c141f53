"""Round-2 TPU microbenchmarks: precision ceilings + component timings.

Answers the questions that decide the round-2 perf attack (VERDICT #1):

1. What does each matmul precision actually deliver on this chip?
   (is 'highest' 3-pass ~bf16peak/3 or 6-pass ~bf16peak/6?)
2. Where do the N=28672 panel-step components sit individually:
   lax cholesky(4096), triangular_solve, inverse-GEMM panel, the Pallas
   trailing kernel at several (tb, kb) configs.

Writes one JSON line per measurement to stdout; diagnostics to stderr.
Run:  nohup python benchmarks/micro_r2.py > results/micro_r2.jsonl 2> results/micro_r2.log &
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

os.environ.setdefault("DLA_TPU_MATMUL_PRECISION", "highest")

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, *args, iters=3, flops=None, label=""):
    """Compile + median-time fn; force completion via scalar readback."""
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])
    t_compile = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(leaf).ravel()[-1])
        t1 = time.perf_counter()
        ts.append(t1 - t0)
    t = sorted(ts)[len(ts) // 2]
    rec = {"label": label, "t_ms": round(t * 1e3, 3), "compile_s": round(t_compile, 1)}
    if flops:
        rec["gflops"] = round(flops / t / 1e9, 1)
    emit(**rec)
    log(f"{label}: {rec}")
    return t


def main():
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    key = jax.random.PRNGKey(0)
    m = 8192
    a = jax.random.normal(key, (m, m), jnp.float32)
    b = jax.random.normal(key, (m, m), jnp.float32)
    fl = 2 * m**3

    # --- 1. matmul precision ceilings -----------------------------------
    for prec in ("default", "high", "highest"):
        f = jax.jit(lambda x, y, p=prec: jnp.matmul(x, y, precision=p))
        timed(f, a, b, flops=fl, label=f"matmul8192_f32_{prec}")
    abf, bbf = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    f = jax.jit(lambda x, y: jnp.matmul(x, y, preferred_element_type=jnp.float32))
    timed(f, abf, bbf, flops=fl, label="matmul8192_bf16")

    # --- 2. panel-step components at the ship config (N=28672, NB=4096) --
    nb, mrows = 4096, 24576
    from dla_tpu.ops import plgsy

    spd = jax.jit(lambda: plgsy(nb, bump=float(nb), seed=7, dtype=jnp.float32))()
    _ = float(spd[0, 0])
    panel = jax.random.normal(key, (mrows, nb), jnp.float32)

    timed(
        jax.jit(lambda d: jax.lax.linalg.cholesky(d, symmetrize_input=False)),
        spd,
        flops=nb**3 / 3,
        label="lax_cholesky_4096",
    )

    lfac = jax.jit(lambda d: jnp.tril(jax.lax.linalg.cholesky(d, symmetrize_input=False)))(spd)
    _ = float(lfac[0, 0])

    timed(
        jax.jit(
            lambda l, p: jax.lax.linalg.triangular_solve(
                l, p, left_side=False, lower=True, transpose_a=True
            )
        ),
        lfac,
        panel,
        flops=mrows * nb**2,
        label="triangular_solve_24576x4096",
    )

    # inverse-GEMM panel (r1 ship path): trsm vs I + big GEMM
    def invgemm(l, p):
        linv = jax.lax.linalg.triangular_solve(
            l, jnp.eye(nb, dtype=jnp.float32), left_side=True, lower=True
        )
        return jnp.matmul(p, linv.T, precision="highest")

    timed(
        jax.jit(invgemm),
        lfac,
        panel,
        flops=nb**3 / 3 + 2 * mrows * nb**2,
        label="invgemm_panel_24576x4096",
    )

    # blocked-trsm panel: invert only 512-diag blocks, GEMM the rest
    def blocked_trsm(l, p, ib=512):
        x = jnp.zeros_like(p)
        for off in range(0, nb, ib):
            dinv = jax.lax.linalg.triangular_solve(
                l[off : off + ib, off : off + ib],
                jnp.eye(ib, dtype=jnp.float32),
                left_side=True,
                lower=True,
            )
            rhs = p[:, off : off + ib] - jnp.matmul(
                x[:, :off], l[off : off + ib, :off].T, precision="highest"
            )
            x = x.at[:, off : off + ib].set(jnp.matmul(rhs, dinv.T, precision="highest"))
        return x

    timed(
        jax.jit(blocked_trsm),
        lfac,
        panel,
        flops=mrows * nb**2,
        label="blockedtrsm_panel_24576x4096",
    )

    # --- 3. trailing kernel configs --------------------------------------
    from dla_tpu.kernels.pallas_tiles import trailing_update_lower

    c = jax.random.normal(key, (mrows, mrows), jnp.float32)
    nt = mrows // 512
    fl_tr = 2 * (nt * (nt + 1) // 2) * 512 * 512 * nb  # lower pairs only

    for tb, kb in ((512, 512), (512, 1024), (1024, 256), (1024, 512), (2048, 256)):
        ntb = mrows // tb
        fl_tb = 2 * (ntb * (ntb + 1) // 2) * tb * tb * nb
        try:
            f = jax.jit(
                lambda cc, pp, tb=tb, kb=kb: trailing_update_lower(
                    cc, pp, tb=tb, kb=kb, alias=True
                )
            )
            timed(f, c, panel, flops=fl_tb, label=f"trailing_24576_tb{tb}_kb{kb}")
        except Exception as e:  # noqa: BLE001
            emit(label=f"trailing_24576_tb{tb}_kb{kb}", error=str(e)[:200])
            log(f"trailing tb={tb} kb={kb} failed: {e}")

    # plain XLA square trailing GEMM for comparison (2x flops, no masking)
    timed(
        jax.jit(lambda cc, pp: cc - jnp.matmul(pp, pp.T, precision="highest")),
        c,
        panel,
        flops=2 * mrows * mrows * nb,
        label="xla_square_trailing_24576",
    )

    # --- 4. host->device transfer bandwidth (tunnel) ---------------------
    h = np.random.default_rng(0).standard_normal((8192, 8192)).astype(np.float32)
    t0 = time.perf_counter()
    d = jax.device_put(h)
    _ = float(d[0, 0])
    t1 = time.perf_counter()
    emit(label="h2d_256MB", t_ms=round((t1 - t0) * 1e3, 1), mbps=round(h.nbytes / (t1 - t0) / 1e6, 1))
    t0 = time.perf_counter()
    back = np.asarray(d)
    t1 = time.perf_counter()
    emit(label="d2h_256MB", t_ms=round((t1 - t0) * 1e3, 1), mbps=round(back.nbytes / (t1 - t0) / 1e6, 1))

    log("done")


if __name__ == "__main__":
    main()
