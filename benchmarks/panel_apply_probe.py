"""Micro: panel_apply (fused Pallas blocked-TRSM) vs _blocktrsm_panel
(XLA dots) at the r3 headline panel shapes, on the real chip.

Run:  python benchmarks/panel_apply_probe.py >> benchmarks/results_r3/panel_apply.jsonl 2>> benchmarks/results_r3/panel_apply.log
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

os.environ.setdefault("DLA_TPU_MATMUL_PRECISION", "high")

import jax

if os.environ.get("PB_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PB_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from dla_tpu.algos.potrf import _blocktrsm_panel
from dla_tpu.kernels.pallas_tiles import panel_apply

NB = int(os.environ.get("PB_NB", 1024))
IB = int(os.environ.get("PB_IB", 512))
HEIGHTS = tuple(int(h) for h in os.environ.get(
    "PB_HEIGHTS", "30720,14336,6144").split(","))
ITERS = int(os.environ.get("PB_ITERS", 32))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log(f"backend={jax.default_backend()} NB={NB} IB={IB}")
    x = jnp.zeros((8, 8), jnp.float32) + 1
    _ = float(x[0, 0])
    t0 = time.perf_counter()
    for _i in range(10):
        _ = float(x[0, 0])
    rtt = (time.perf_counter() - t0) / 10
    log(f"rtt={rtt*1e3:.1f} ms")

    r = jax.lax.broadcasted_iota(jnp.float32, (NB, NB), 0)
    c = jax.lax.broadcasted_iota(jnp.float32, (NB, NB), 1)
    lkk = jax.jit(lambda: jnp.tril(jnp.sin(r * .7 + c * 1.3) * 1e-3
                                   + 2.0 * jnp.eye(NB)))()
    _ = float(lkk[0, 0])
    for h in HEIGHTS:
        b0 = jax.jit(lambda h=h: jnp.sin(
            jax.lax.broadcasted_iota(jnp.float32, (h, NB), 0) * .3 +
            jax.lax.broadcasted_iota(jnp.float32, (h, NB), 1)) * 1e-2)()
        _ = float(b0[0, 0])
        flops = float(h) * NB * NB
        for name, fn in [
            ("blocktrsm", jax.jit(lambda x: _blocktrsm_panel(lkk, x, ib=IB))),
            ("pallas", jax.jit(lambda x: panel_apply(lkk, x, ib=IB))),
            ("pallas_tb512", jax.jit(
                lambda x: panel_apply(lkk, x, ib=IB, tb=512))),
            ("pallas_ib1024", jax.jit(
                lambda x: panel_apply(lkk, x, ib=NB))),
            # smaller in-kernel ib: blocked-TRSM real flops are
            # (1 - 1/nk + 2·ib/nb)·h·nb² — 1.25x at ib=nb/4, 1.125x at nb/8
            ("pallas_ib256", jax.jit(
                lambda x: panel_apply(lkk, x, ib=256))),
            ("pallas_ib128", jax.jit(
                lambda x: panel_apply(lkk, x, ib=128))),
        ]:
            try:
                t0 = time.perf_counter()
                y = fn(b0)
                _ = float(y[0, 0])
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                for _i in range(ITERS):
                    y = fn(y)
                _ = float(y[0, 0])
                per = (time.perf_counter() - t0 - rtt) / ITERS
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"label": f"{name}_h{h}",
                                  "error": repr(e)[:400]}), flush=True)
                continue
            print(json.dumps({
                "label": f"{name}_h{h}", "per_call_s": round(per, 6),
                "gflops": round(flops / per / 1e9, 1),
                "compile_s": round(compile_s, 1)}), flush=True)
            log(f"{name}_h{h}: {per*1e3:.3f} ms {flops/per/1e12:.2f} TF/s")


if __name__ == "__main__":
    main()
