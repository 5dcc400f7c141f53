"""Isolate the on-chip df64-plane accuracy loss (ring_mosaic_df64.log
probe p1: factor err 1.27e-07 on the real chip vs 3.7e-14 on CPU
interpret — fp32-grade, i.e. the lo plane's contribution is lost
somewhere only on hardware).

Three runs on a 1-device TPU mesh, same inputs as the failing probe:

  A. full plane, Mosaic ring (the failing configuration — reproduce);
  B. full plane, interpret=True ring (pallas interpret emulation ON the
     TPU backend; every other op identical) — if B is accurate, the
     Mosaic ring kernel corrupts the stacked df64 payload; if B is also
     inaccurate, a non-pallas op degrades on TPU;
  C. the _solve branch alone (cholesky + TRSM + df64 refinement) under
     shard_map on the chip, gated vs scipy — isolates the XLA linalg
     ops' on-TPU behavior from the data plane.

Run:  setsid nohup python benchmarks/df64_plane_isolate.py \
        > benchmarks/results_r5/df64_plane_isolate.log 2>&1 &
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
    from jax.sharding import Mesh

    from dla_tpu.ops import plgsy
    from dla_tpu.ops.df64 import to_df64
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
    n, nb = 512, 128
    a = np.asarray(plgsy(n, seed=13, dtype=jnp.float64))
    ah, al = to_df64(a)
    ref = scipy.linalg.cholesky(a, lower=True)

    def run_plane(interpret):
        xh = pack_cols_packed(np.asarray(ah), nb, mesh1)
        xl = pack_cols_packed(np.asarray(al), nb, mesh1)
        lh, ll = potrf_packed_cyclic_df64(
            xh, xl, n, nb, mesh1, interpret=interpret)
        l = (np.asarray(unpack_cols_packed(lh, n, nb, mesh1), np.float64)
             + np.asarray(unpack_cols_packed(ll, n, nb, mesh1),
                          np.float64))
        return np.max(np.abs(l - ref)) / np.max(np.abs(ref))

    for name, interp in (("A mosaic-ring", None), ("B interpret-ring",
                                                   True)):
        try:
            ferr = run_plane(interp)
            log(f"[{name}] factor err vs scipy fp64: {ferr:.3e} "
                f"({'df64-grade' if ferr < 1e-11 else 'DEGRADED'})")
        except Exception:
            log(f"[{name}] CRASH")
            traceback.print_exc(file=sys.stdout)

    # C: the _solve branch under shard_map / plain jit, nb 128 / 1024 —
    # the r4 single-chip potrf_df64 (nb=1024, plain jit) measured
    # df64-grade on this chip while the plane (nb=128, shard_map) did
    # not: these four cells split block size from shard_map wrapping.
    try:
        from jax.sharding import PartitionSpec as P

        from dla_tpu.algos.potrf_df64 import (
            _factor_diag_df64,
            _panel_solve_df64,
        )

        gemm_kw = dict(s=7, w=8, precise_deg=3)

        def solve_local(dh, dl, ch, cl):
            lkk_h, lkk_l = _factor_diag_df64(
                dh, dl, refine=2, gemm_kw=gemm_kw)
            sh, sl_ = _panel_solve_df64(
                lkk_h, lkk_l, ch, cl, refine=2, gemm_kw=gemm_kw)
            return lkk_h, lkk_l, sh, sl_

        def run_solve(nb_c, shard):
            n_c = 4 * nb_c
            g = np.random.default_rng(5).standard_normal((n_c, n_c))
            ac = (g + g.T) / 2 + n_c * np.eye(n_c)
            ah_c, al_c = to_df64(ac)
            if shard:
                f = jax.jit(jax.shard_map(
                    solve_local, mesh=mesh1,
                    in_specs=(P(None, None),) * 4,
                    out_specs=(P(None, None),) * 4,
                    check_vma=False))
            else:
                f = jax.jit(solve_local)
            dh = np.asarray(ah_c)[:nb_c, :nb_c]
            dl = np.asarray(al_c)[:nb_c, :nb_c]
            ch = np.asarray(ah_c)[nb_c:, :nb_c]
            cl = np.asarray(al_c)[nb_c:, :nb_c]
            lkk_h, lkk_l, sh, sl_ = f(jnp.asarray(dh), jnp.asarray(dl),
                                      jnp.asarray(ch), jnp.asarray(cl))
            lkk = (np.asarray(lkk_h, np.float64)
                   + np.asarray(lkk_l, np.float64))
            sol = np.asarray(sh, np.float64) + np.asarray(sl_, np.float64)
            ref_kk = scipy.linalg.cholesky(ac[:nb_c, :nb_c], lower=True)
            e1 = np.max(np.abs(lkk - ref_kk)) / np.max(np.abs(ref_kk))
            ref_sol = scipy.linalg.solve_triangular(
                ref_kk, ac[nb_c:, :nb_c].T, lower=True).T
            e2 = np.max(np.abs(sol - ref_sol)) / np.max(np.abs(ref_sol))
            log(f"[C nb={nb_c} shard_map={shard}] diag factor err "
                f"{e1:.3e}, panel solve err {e2:.3e} "
                f"({'df64-grade' if max(e1, e2) < 1e-11 else 'DEGRADED'})")

        for nb_c in (128, 1024):
            for shard in (True, False):
                run_solve(nb_c, shard)
    except Exception:
        log("[C solve-branch] CRASH")
        traceback.print_exc(file=sys.stdout)

    # D: the plane's TRAILING math in isolation — pre-sliced reuse
    # (slice_rows once + lax.dynamic_slice row sub-ranges, the plane's
    # path) vs internal slicing (df64_matmul_nt from the (hi, lo) pair,
    # the path probe C exonerated), both on chip vs fp64.
    try:
        import functools

        from jax import lax

        from dla_tpu.ops.df64 import df64_matmul_nt, slice_rows

        rng = np.random.default_rng(7)
        rows, nbd = 384, 128
        x = rng.standard_normal((rows, nbd))
        xh_, xl_ = to_df64(x)
        ref = x @ x[:nbd].T

        @functools.partial(jax.jit, static_argnames=("s", "w", "pd"))
        def direct(h, l, *, s, w, pd):
            return df64_matmul_nt(h, l, h[:nbd], l[:nbd],
                                  s=s, w=w, precise_deg=pd)

        @functools.partial(jax.jit, static_argnames=("s", "w", "pd"))
        def reuse(h, l, op, *, s, w, pd):
            sx = slice_rows(h, l, s=s, w=w)[0]
            z0 = jnp.zeros_like(op)
            sa = [lax.dynamic_slice(sl, (op, z0), (rows, nbd))
                  for sl in sx]
            sb = [lax.dynamic_slice(sl, (op, z0), (nbd, nbd)) for sl in sx]
            return df64_matmul_nt(None, None, None, None, slices_a=sa,
                                  slices_b=sb, s=s, w=w, precise_deg=pd)

        for name, fn in (("direct", lambda: direct(xh_, xl_, s=7, w=8,
                                                   pd=3)),
                         ("reuse", lambda: reuse(xh_, xl_,
                                                 jnp.int32(0), s=7, w=8,
                                                 pd=3))):
            ph, pl = fn()
            got = np.asarray(ph, np.float64) + np.asarray(pl, np.float64)
            err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
            log(f"[D trailing {name}] rel err vs fp64: {err:.3e} "
                f"({'df64-grade' if err < 1e-12 else 'DEGRADED'})")
    except Exception:
        log("[D trailing] CRASH")
        traceback.print_exc(file=sys.stdout)

    log("isolation probe complete")


if __name__ == "__main__":
    main()
