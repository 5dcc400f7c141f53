"""Mosaic probe of the r5 DISTRIBUTED-DF64 plane on the real chip
(VERDICT r4 next-round #1, mirroring the r4 fp32 probe
ring_mosaic_compile.py):

1. execute potrf_packed_cyclic_df64 Mosaic-compiled on a 1-device TPU
   mesh at toy N — the full df64 ring program (refined df64 diagonal
   factor, df64 panel TRSM, pair-stacked ring broadcasts, exact-sliced
   MXU trailing) through the real Mosaic lowering, factor gated against
   scipy fp64 at the df64 floor (~1e-12 — two decades past fp32);
2. AOT-compile the FULL 8-device df64 factorization against a real
   v5e:2x4 topology description.

Run (one TPU process at a time, never kill mid-compile — CLAUDE.md):
    setsid nohup python benchmarks/ring_mosaic_compile_r5.py \
        > benchmarks/results_r5/ring_mosaic_df64.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def log(*a):
    print(*a, flush=True)


def probe(name):
    def deco(fn):
        def run():
            t0 = time.perf_counter()
            log(f"--- probe: {name}")
            try:
                msg = fn()
                log(f"PASS {name} ({time.perf_counter() - t0:.1f}s)"
                    + (f" — {msg}" if msg else ""))
                return True
            except Exception:
                log(f"FAIL {name} ({time.perf_counter() - t0:.1f}s)")
                traceback.print_exc(file=sys.stdout)
                return False
        run.__name__ = name
        return run
    return deco


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    if jax.default_backend() != "tpu":
        log("NOT a TPU backend — abort")
        sys.exit(2)

    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup: {time.perf_counter() - t0:.1f}s")

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("d",))

    @probe("potrf_packed_cyclic_DF64 on a 1-device TPU mesh (toy N)")
    def p1():
        import scipy.linalg

        from dla_tpu.ops.df64 import to_df64
        from dla_tpu.parallel import (
            pack_cols_packed,
            potrf_packed_cyclic_df64,
            unpack_cols_packed,
        )

        n, nb = 512, 128
        # HOST-built fp64 A: plgsy(dtype=float64) on an un-x64 TPU
        # process silently returns float32 values, which made the
        # scipy fp64 reference itself fp32-grade — the first probe's
        # 1.27e-07 "failure" was the REFERENCE's error (r5 isolation)
        g = np.random.default_rng(13).standard_normal((n, n))
        a = (g + g.T) / 2 + n * np.eye(n)
        ah, al = to_df64(a)
        xh = pack_cols_packed(np.asarray(ah), nb, mesh1)
        xl = pack_cols_packed(np.asarray(al), nb, mesh1)
        lh, ll = potrf_packed_cyclic_df64(xh, xl, n, nb, mesh1)
        l = (np.asarray(unpack_cols_packed(lh, n, nb, mesh1), np.float64)
             + np.asarray(unpack_cols_packed(ll, n, nb, mesh1), np.float64))
        ref = scipy.linalg.cholesky(a, lower=True)
        ferr = np.max(np.abs(l - ref)) / np.max(np.abs(ref))
        assert ferr < 1e-11, ferr
        res = np.abs(a - l @ l.T).sum(1).max() / np.abs(a).sum(1).max()
        assert res < 1e-10, res
        return (f"Mosaic-compiled df64 ring program executed on chip: "
                f"factor err {ferr:.2e} vs scipy fp64, residual {res:.2e} "
                f"(1e-10 gate PASS)")

    def _topology():
        from jax.experimental import topologies

        for name in ("v5e:2x4", "v5e:1x8", "tpu_v5_lite:2x4"):
            try:
                topo = topologies.get_topology_desc(
                    platform="tpu", topology_name=name)
                log(f"  topology {name}: {len(topo.devices)} devices")
                return topo
            except Exception as e:
                log(f"  topology {name} unavailable: {type(e).__name__}: {e}")
        raise RuntimeError("no v5e topology description available")

    @probe("AOT 8-device FULL packed-cyclic DF64 POTRF compile (v5e:2x4)")
    def p2():
        from dla_tpu.parallel import packed_cyclic

        topo = _topology()
        tmesh = Mesh(np.asarray(topo.devices).reshape(-1), ("d",))
        n, nb, ndev = 2048, 128, 8
        _, _, _, off = packed_cyclic._geometry(n, nb, ndev)
        x = jax.ShapeDtypeStruct((off[-1] * ndev, nb), jnp.float32)
        lowered = packed_cyclic._potrf_df64_jit_n.lower(
            x, x, n, nb, tmesh, 7, 8, 3, 2, True, None)
        compiled = lowered.compile()
        del compiled
        return ("full 8-device packed column-cyclic DF64 factorization "
                "(pair-stacked ring broadcasts, df64 refined factor/TRSM, "
                "exact-sliced trailing) Mosaic-AOT-compiled for v5e:2x4")

    results = [p() for p in (p1, p2)]
    log(f"=== {sum(results)}/{len(results)} df64 ring probes passed ===")
    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()
