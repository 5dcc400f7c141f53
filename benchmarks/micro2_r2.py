"""Round-2 TPU probes, part 2: amortized precision ceilings, trailing-kernel
tb=1024 unlock attempts, recursive-triangular XLA trailing, blocked diag chol.

Run:  nohup python benchmarks/micro2_r2.py > results/micro2_r2.jsonl 2> results/micro2_r2.log &
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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, *args, iters=3, flops=None, label=""):
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(leaf).ravel()[0])
        t_compile = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001
        emit(label=label, error=repr(e)[:1500])
        log(f"{label} FAILED: {repr(e)[:1500]}")
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
        # RTT-corrected estimate (scalar readback ~30ms on this tunnel)
        rec["gflops_rttcorr"] = round(flops / max(t - 0.030, 1e-4) / 1e9, 1)
    emit(**rec)
    log(f"{label}: {rec}")
    return t


def main():
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    key = jax.random.PRNGKey(0)

    # --- 1. amortized matmul ceilings: chain 8 matmuls in one jit ---------
    m = 8192
    a = jax.random.normal(key, (m, m), jnp.float32) * 0.01
    b = jax.random.normal(key, (m, m), jnp.float32) * 0.01

    CH = 8
    for prec in ("default", "high", "highest"):

        def chain(x, y, p=prec):
            for _ in range(CH):
                x = jnp.matmul(x, y, precision=p) * 1e-2
            return x

        timed(jax.jit(chain), a, b, flops=CH * 2 * m**3, label=f"chain8_f32_{prec}")

    abf, bbf = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)

    def chainbf(x, y):
        for _ in range(CH):
            x = (jnp.matmul(x, y, preferred_element_type=jnp.float32) * 1e-2).astype(
                jnp.bfloat16
            )
        return x

    timed(jax.jit(chainbf), abf, bbf, flops=CH * 2 * m**3, label="chain8_bf16")

    # --- 2. trailing kernel tb unlock ------------------------------------
    from dla_tpu.kernels.pallas_tiles import trailing_update_lower

    nb, mrows = 4096, 24576
    panel = jax.random.normal(key, (mrows, nb), jnp.float32) * 0.01
    c = jax.random.normal(key, (mrows, mrows), jnp.float32)

    configs = [
        dict(tb=1024, kb=256, alias=True, vmem=None, dimsem=None),
        dict(tb=1024, kb=256, alias=True, vmem=100 * 2**20, dimsem=None),
        dict(tb=1024, kb=256, alias=False, vmem=100 * 2**20, dimsem=None),
        dict(tb=1024, kb=256, alias=True, vmem=100 * 2**20, dimsem=("arbitrary", "arbitrary")),
        dict(tb=1024, kb=512, alias=True, vmem=100 * 2**20, dimsem=None),
        dict(tb=2048, kb=128, alias=True, vmem=100 * 2**20, dimsem=None),
        dict(tb=512, kb=512, alias=True, vmem=100 * 2**20, dimsem=None),
    ]
    for cf in configs:
        ntb = mrows // cf["tb"]
        fl = 2 * (ntb * (ntb + 1) // 2) * cf["tb"] ** 2 * nb
        lbl = (
            f"trail_tb{cf['tb']}_kb{cf['kb']}_al{int(cf['alias'])}"
            f"_vm{int(bool(cf['vmem']))}_ds{int(bool(cf['dimsem']))}"
        )
        f = jax.jit(
            lambda cc, pp, cf=cf: trailing_update_lower(
                cc,
                pp,
                tb=cf["tb"],
                kb=cf["kb"],
                alias=cf["alias"],
                vmem_limit_bytes=cf["vmem"],
                dimension_semantics=cf["dimsem"],
            )
        )
        timed(f, c, panel, flops=fl, label=lbl)

    # --- 3. recursive lower-triangular trailing via XLA GEMMs -------------
    def tri_update(cc, pp, levels):
        """cc (m,m) lower trailing; subtract pp@pp.T on the lower triangle
        only, recursively: bottom-left rectangle as a plain GEMM, recurse
        into the two diagonal squares; leaves = full square GEMMs."""
        mm = cc.shape[0]
        if levels == 0 or mm <= 2048:
            return cc - jnp.matmul(pp, pp.T, precision="highest")
        h = mm // 2
        tl = tri_update(cc[:h, :h], pp[:h], levels - 1)
        bl = cc[h:, :h] - jnp.matmul(pp[h:], pp[:h].T, precision="highest")
        br = tri_update(cc[h:, h:], pp[h:], levels - 1)
        top = jnp.concatenate([tl, cc[:h, h:]], axis=1)
        bot = jnp.concatenate([bl, br], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    ideal = mrows * mrows * nb + mrows * nb * nb  # lower triangle + diag band
    for lv in (2, 3):
        timed(
            jax.jit(lambda cc, pp, lv=lv: tri_update(cc, pp, lv)),
            c,
            panel,
            flops=ideal,
            label=f"tri_update_l{lv}",
        )

    # --- 4. two-level diagonal chol(4096) vs lax --------------------------
    from dla_tpu.ops import plgsy

    spd = jax.jit(lambda: plgsy(nb, bump=float(nb), seed=7, dtype=jnp.float32))()
    _ = float(spd[0, 0])

    def chol2level(d, ib=512):
        n = d.shape[0]
        out = jnp.zeros_like(d)
        t = d
        for off in range(0, n, ib):
            w = ib
            lkk = jnp.tril(jax.lax.linalg.cholesky(t[:w, :w], symmetrize_input=False))
            if off + w < n:
                linv = jax.lax.linalg.triangular_solve(
                    lkk, jnp.eye(w, jnp.float32), left_side=True, lower=True
                )
                lp = jnp.matmul(t[w:, :w], linv.T, precision="highest")
                strip = jnp.concatenate([lkk, lp], axis=0)
                t = t[w:, w:] - jnp.matmul(lp, lp.T, precision="highest")
            else:
                strip = lkk
            out = jax.lax.dynamic_update_slice(out, strip, (off, off))
        return out

    timed(jax.jit(chol2level), spd, flops=nb**3 / 3, label="chol4096_2level")
    timed(
        jax.jit(lambda d: jax.lax.linalg.cholesky(d, symmetrize_input=False)),
        spd,
        flops=nb**3 / 3,
        label="chol4096_lax_again",
    )

    log("done")


if __name__ == "__main__":
    main()
