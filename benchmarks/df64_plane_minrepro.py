"""Minimal on-chip repro of the df64-plane degradation (r5).

Every piece passes in isolation on the chip (isolate3: ring bit-exact in
r4, solve branch 2e-14 at both nb, trailing slice-reuse 5e-14), yet the
composed plane at n=512/nb=128 degrades to 1.27e-07. This script runs an
nt=2 (n=256, nb=128) case three ways on a 1-device TPU mesh:

  P. the full plane (potrf_packed_cyclic_df64);
  M. a MANUAL composition of the same steps in one shard_map program —
     factor diag0, df64 panel solve, slice_rows, trailing into slab1,
     factor diag1 — with NO ring broadcast;
  R. the manual composition WITH the two ring broadcasts inserted
     (stacked pair, exactly as the plane does).

Whichever of M/R first diverges from scipy fp64 pins the corruptor.

Run:  setsid nohup python benchmarks/df64_plane_minrepro.py \
        > benchmarks/results_r5/df64_plane_minrepro.log 2>&1 &
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


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    import scipy.linalg
    from jax import lax
    from jax.sharding import Mesh, PartitionSpec as P

    from dla_tpu.algos.potrf_df64 import (
        _factor_diag_df64,
        _panel_solve_df64,
    )
    from dla_tpu.kernels.collectives import ring_broadcast
    from dla_tpu.ops.df64 import (
        df_sub,
        df64_matmul_nt,
        slice_rows,
        to_df64,
    )
    from dla_tpu.parallel import (
        pack_cols_packed,
        potrf_packed_cyclic_df64,
        unpack_cols_packed,
    )

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup: {time.perf_counter() - t0:.1f}s")

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("d",))
    n, nb = 256, 128
    g = np.random.default_rng(5).standard_normal((n, n))
    a = (g + g.T) / 2 + n * np.eye(n)
    ah, al = to_df64(a)
    ref = scipy.linalg.cholesky(a, lower=True)

    def gate(l, name):
        ferr = np.max(np.abs(l - ref)) / np.max(np.abs(ref))
        log(f"[{name}] factor err vs scipy fp64: {ferr:.3e} "
            f"({'df64-grade' if ferr < 1e-11 else 'DEGRADED'})")

    # P: the full plane
    try:
        xh = pack_cols_packed(np.asarray(ah), nb, mesh1)
        xl = pack_cols_packed(np.asarray(al), nb, mesh1)
        lh, ll = potrf_packed_cyclic_df64(xh, xl, n, nb, mesh1)
        l = (np.asarray(unpack_cols_packed(lh, n, nb, mesh1), np.float64)
             + np.asarray(unpack_cols_packed(ll, n, nb, mesh1),
                          np.float64))
        gate(l, "P plane nt=2")
    except Exception:
        log("[P] CRASH")
        traceback.print_exc(file=sys.stdout)

    # M / R: manual composition (dense state for clarity), +/- ring
    gemm_kw = dict(s=7, w=8, precise_deg=3)

    def manual(dh, dl, ph_, pl_, th_, tl_, use_ring):
        # step 0: factor diag0, solve panel, trailing into diag1
        lkk_h, lkk_l = _factor_diag_df64(dh, dl, refine=2, gemm_kw=gemm_kw)
        sh, sl_ = _panel_solve_df64(lkk_h, lkk_l, ph_, pl_, refine=2,
                                    gemm_kw=gemm_kw)
        if use_ring:
            dpair = ring_broadcast(
                jnp.concatenate([lkk_h, lkk_l], axis=0), "d", 0,
                collective_id=0)
            lkk_h, lkk_l = dpair[:nb], dpair[nb:]
            ppair = ring_broadcast(
                jnp.concatenate([sh, sl_], axis=0), "d", 0,
                collective_id=1)
            sh, sl_ = ppair[:nb], ppair[nb:]
        sx = slice_rows(sh, sl_, s=7, w=8)[0]
        z0 = jnp.int32(0)
        sa = [lax.dynamic_slice(sl2, (z0, z0), (nb, nb)) for sl2 in sx]
        uh, ul = df64_matmul_nt(None, None, None, None, slices_a=sa,
                                slices_b=sa, **gemm_kw)
        ch, cl = df_sub(th_, tl_, uh, ul)
        # step 1: factor diag1
        l1h, l1l = _factor_diag_df64(ch, cl, refine=2, gemm_kw=gemm_kw)
        return lkk_h, lkk_l, sh, sl_, l1h, l1l

    for use_ring, name in ((False, "M manual no-ring"),
                           (True, "R manual +ring")):
        try:
            f = jax.jit(jax.shard_map(
                lambda *args, _r=use_ring: manual(*args, _r),
                mesh=mesh1, in_specs=(P(None, None),) * 6,
                out_specs=(P(None, None),) * 6, check_vma=False))
            dh = jnp.asarray(np.asarray(ah)[:nb, :nb])
            dl = jnp.asarray(np.asarray(al)[:nb, :nb])
            ph_ = jnp.asarray(np.asarray(ah)[nb:, :nb])
            pl_ = jnp.asarray(np.asarray(al)[nb:, :nb])
            th_ = jnp.asarray(np.asarray(ah)[nb:, nb:])
            tl_ = jnp.asarray(np.asarray(al)[nb:, nb:])
            lkk_h, lkk_l, sh, sl_, l1h, l1l = f(dh, dl, ph_, pl_, th_, tl_)
            l = np.zeros((n, n))
            l[:nb, :nb] = (np.asarray(lkk_h, np.float64)
                           + np.asarray(lkk_l, np.float64))
            l[nb:, :nb] = (np.asarray(sh, np.float64)
                           + np.asarray(sl_, np.float64))
            l[nb:, nb:] = (np.asarray(l1h, np.float64)
                           + np.asarray(l1l, np.float64))
            l = np.tril(l)
            gate(l, name)
        except Exception:
            log(f"[{name}] CRASH")
            traceback.print_exc(file=sys.stdout)

    log("minrepro complete")


if __name__ == "__main__":
    main()
