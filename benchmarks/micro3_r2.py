"""Round-2 TPU probes, part 3: trailing kernel + panel components at the
precision given by DLA_TPU_MATMUL_PRECISION (run once per precision).

Run:
  for p in high default; do
    DLA_TPU_MATMUL_PRECISION=$p python benchmarks/micro3_r2.py \
      >> results/micro3_r2.jsonl 2>> results/micro3_r2.log
  done
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

PREC = os.environ.get("DLA_TPU_MATMUL_PRECISION", "highest")

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, *args, iters=3, flops=None, label=""):
    label = f"{label}@{PREC}"
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(leaf).ravel()[0])
        t_compile = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001
        emit(label=label, error=repr(e)[:800])
        log(f"{label} FAILED: {repr(e)[:800]}")
        return None
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(leaf).ravel()[-1])
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[len(ts) // 2]
    rec = {"label": label, "t_ms": round(t * 1e3, 3), "compile_s": round(t_compile, 1)}
    if flops:
        rec["gflops"] = round(flops / t / 1e9, 1)
        rec["gflops_rttcorr"] = round(flops / max(t - 0.030, 1e-4) / 1e9, 1)
    emit(**rec)
    log(f"{label}: {rec}")
    return t


def main():
    log(f"backend={jax.default_backend()} precision={PREC}")
    key = jax.random.PRNGKey(0)

    from dla_tpu.kernels.pallas_tiles import trailing_update_lower

    nb, mrows = 4096, 24576
    panel = jax.random.normal(key, (mrows, nb), jnp.float32) * 0.01
    c = jax.random.normal(key, (mrows, mrows), jnp.float32)
    VM = 100 * 2**20

    for tb, kb, alias in (
        (512, 512, True),
        (1024, 256, False),
        (1024, 512, True),
        (2048, 128, True),
        (2048, 256, False),
    ):
        ntb = mrows // tb
        fl = 2 * (ntb * (ntb + 1) // 2) * tb * tb * nb
        f = jax.jit(
            lambda cc, pp, tb=tb, kb=kb, alias=alias: trailing_update_lower(
                cc, pp, tb=tb, kb=kb, alias=alias, vmem_limit_bytes=VM
            )
        )
        timed(f, c, panel, flops=fl, label=f"trail_tb{tb}_kb{kb}_al{int(alias)}")

    # panel components at this precision
    from dla_tpu.algos.potrf import _blocktrsm_panel
    from dla_tpu.ops import plgsy

    spd = jax.jit(lambda: plgsy(nb, bump=float(nb), seed=7, dtype=jnp.float32))()
    lfac = jax.jit(lambda d: jnp.tril(jax.lax.linalg.cholesky(d, symmetrize_input=False)))(spd)
    _ = float(lfac[0, 0])

    timed(
        jax.jit(_blocktrsm_panel),
        lfac,
        panel,
        flops=mrows * nb**2,
        label="blocktrsm_24576x4096",
    )

    timed(
        jax.jit(lambda d: jax.lax.linalg.cholesky(d, symmetrize_input=False)),
        spd,
        flops=nb**3 / 3,
        label="chol4096_lax",
    )

    def chol2level(d, ib=512):
        n = d.shape[0]
        from dla_tpu.ops import gemm, trsm

        out = jnp.zeros_like(d)
        t = d
        for off in range(0, n, ib):
            w = ib
            lkk = jnp.tril(jax.lax.linalg.cholesky(t[:w, :w], symmetrize_input=False))
            if off + w < n:
                linv = trsm(1.0, lkk, jnp.eye(w, dtype=d.dtype), side="L", transa=False)
                lp = gemm(1.0, t[w:, :w], linv, 0.0, jnp.zeros((n - off - w, w), d.dtype), transb=True)
                strip = jnp.concatenate([lkk, lp], axis=0)
                t = gemm(-1.0, lp, lp, 1.0, t[w:, w:], transb=True)
            else:
                strip = lkk
            out = jax.lax.dynamic_update_slice(out, strip, (off, off))
        return out

    timed(jax.jit(chol2level), spd, flops=nb**3 / 3, label="chol4096_2level")

    log("done")


if __name__ == "__main__":
    main()
