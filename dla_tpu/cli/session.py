"""Distributed factorization "session" CLI — the TPU-native ArmoniK client.

Parameter-surface parity with the reference's DAG client
(``client_distrib.cpp``):

- config from env ``CHOLESKY_N`` / ``CHOLESKY_B``, flags ``--N=`` / ``--B=``,
  or positionals, with fallback-on-invalid parsing (``:41-93``);
- optional JSON config file merged with env (the ``appsettings.json``
  analogue, ``:329``);
- wave-by-wave progress logging of the right-looking DAG
  (POTRF(k,k) → TRSM(i,k) → SYRK(i,i)/GEMM(i,j,k), ``:506-565``) with
  ``[CLIENT]``-style tags.

What is deliberately *different* (the TPU-native design, SURVEY §1 L4):
there is no control plane, no blob store, no per-task JSON payloads, and —
crucially — no per-task blocking wait (the reference serializes its whole
DAG on ``wait_for_result_availability``, ``:499``). The wave loop here is
*trace-time only*: it logs the DAG shape and counts, while execution is one
jitted shard_map program in which XLA schedules every wave's tile ops
concurrently and panel broadcasts ride ICI collectives. Matrix generation is
tile-local on the owning device (the client-side full-matrix-in-RAM
build + per-tile upload at ``:402-432`` has no equivalent — nothing is
uploaded).
"""

from __future__ import annotations

import argparse
import sys
import time


def dag_counts(nt: int) -> dict[str, int]:
    """Task counts of the right-looking DAG at Nb=nt tiles (the reference's
    N=12,B=4 demo is 3×3 tiles → 10 tasks)."""
    potrf = nt
    trsm = nt * (nt - 1) // 2
    syrk = nt * (nt - 1) // 2
    gemm = nt * (nt - 1) * (nt - 2) // 6
    return {
        "POTRF": potrf,
        "TRSM": trsm,
        "SYRK": syrk,
        "GEMM": gemm,
        "total": potrf + trsm + syrk + gemm,
    }


def parse_args(argv=None):
    ap = argparse.ArgumentParser(
        prog="dla-session",
        description="Distributed block-cyclic POTRF session (ArmoniK-client parity)",
    )
    ap.add_argument("--N", type=int, default=None, help="matrix dimension")
    ap.add_argument("--B", type=int, default=None, help="tile size")
    ap.add_argument("--p", type=int, default=None, help="mesh rows")
    ap.add_argument("--q", type=int, default=None, help="mesh cols")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--config", default=None, help="JSON config (appsettings analogue)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--x64", action="store_true")
    ap.add_argument(
        "--solve", type=int, default=0, metavar="NRHS",
        help="after factoring, solve A·X=B for NRHS right-hand sides "
        "(distributed POTRS)",
    )
    ap.add_argument("positional", nargs="*", help="[N [B]] positional fallback")
    return ap.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    # positional fallback with fallback-on-invalid parsing (client parity)
    pos_n = pos_b = None
    try:
        if len(args.positional) >= 1:
            pos_n = int(args.positional[0])
        if len(args.positional) >= 2:
            pos_b = int(args.positional[1])
    except ValueError:
        print("[CLIENT] invalid positional args ignored", flush=True)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        from jax._src import xla_bridge as _xb

        if _xb.backends_are_initialized():
            from jax.extend.backend import clear_backends

            clear_backends()
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from dla_tpu.utils.config import RunConfig

    cfg = RunConfig.layered(
        json_path=args.config,
        n=args.N if args.N is not None else pos_n,
        nb=args.B if args.B is not None else pos_b,
        seed=args.seed,
        dtype=args.dtype,
        p=args.p,
        q=args.q,
    )
    ndev = len(jax.devices())
    p, q = cfg.p, cfg.q
    if p * q == 1 and ndev > 1:
        # auto: squarest grid over available devices
        p = int(np.sqrt(ndev))
        while ndev % p:
            p -= 1
        q = ndev // p

    nt = cfg.n // cfg.nb
    counts = dag_counts(nt)
    print(
        f"[CLIENT] session: N={cfg.n} B={cfg.nb} tiles={nt}x{nt} "
        f"mesh={p}x{q} dtype={cfg.dtype} backend={jax.default_backend()}",
        flush=True,
    )
    print(
        f"[CLIENT] DAG: {counts['POTRF']} POTRF + {counts['TRSM']} TRSM + "
        f"{counts['SYRK']} SYRK + {counts['GEMM']} GEMM = {counts['total']} "
        f"tile tasks (executed concurrently under one jit — no per-task wait)",
        flush=True,
    )
    for k in range(nt):
        ntrsm = nt - 1 - k
        nupd = ntrsm * (ntrsm + 1) // 2
        print(
            f"[CLIENT] wave k={k}: POTRF({k},{k}); {ntrsm} TRSM; {nupd} SYRK/GEMM",
            flush=True,
        )

    from dla_tpu.parallel import (
        BlockCyclicLayout,
        generate_spd_block_cyclic,
        make_mesh,
        potrf_block_cyclic,
        to_dense,
    )
    from dla_tpu.utils.flops import gflops, potrf_flops
    from dla_tpu.validate import residual_potrf

    layout = BlockCyclicLayout(n=cfg.n, nb=cfg.nb, p=p, q=q)
    mesh = make_mesh(p, q)
    dtype = jnp.dtype(cfg.dtype).type

    print("[CLIENT] generating SPD tiles on owning devices...", flush=True)
    x = jax.block_until_ready(
        generate_spd_block_cyclic(layout, mesh, seed=cfg.seed, dtype=dtype)
    )
    print("[CLIENT] submitting factorization...", flush=True)
    t0 = time.perf_counter()
    lx = jax.block_until_ready(potrf_block_cyclic(x, layout, mesh))
    t1 = time.perf_counter()
    perf = gflops(potrf_flops(cfg.n), t1 - t0)
    print(f"Elapsed: {(t1 - t0) * 1e3:.1f} ms")
    print(f"Performance: {perf:.2f} Gflop/s")

    a = jnp.asarray(to_dense(x, layout))
    l = jnp.asarray(np.tril(to_dense(lx, layout)))
    res = float(residual_potrf(a, l, assume_symmetric=True))
    print(f"||A - LL^T||_inf / ||A||_inf = {res:.2e}")
    gate = 1e-10 if jnp.dtype(cfg.dtype) == jnp.float64 else max(1e-10, cfg.n * 2e-7)
    ok = np.isfinite(res) and res < gate

    if args.solve:
        from dla_tpu.parallel import potrs_block_cyclic
        from dla_tpu.validate import residual_posv

        bmat = jnp.ones((cfg.n, args.solve), dtype)
        print(f"[CLIENT] distributed POTRS, nrhs={args.solve}...", flush=True)
        xs = jax.block_until_ready(potrs_block_cyclic(lx, bmat, layout, mesh))
        sres = float(residual_posv(a, bmat, xs, assume_symmetric=True))
        print(f"||B - A X||_inf / (||A||_inf ||X||_inf) = {sres:.2e}")
        ok = ok and np.isfinite(sres) and sres < gate

    print("[CLIENT] session complete:", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
