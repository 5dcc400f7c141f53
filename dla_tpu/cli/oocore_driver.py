"""Out-of-core POTRF driver — the N ≫ HBM configuration as a CLI.

The scale regime the reference served with its distributed blob store
(client holds the full matrix, workers hold O(B²) — SURVEY §5.7); here the
matrix lives in host DRAM (or a disk memmap) and column panels stream
through the device. Resume-able: re-running with the same ``--matrix`` and
``--progress`` paths picks up at the first unfinished panel.

Usage:
    python -m dla_tpu.cli.oocore_driver --n 32768 --panel 4096 --nb 512
    python -m dla_tpu.cli.oocore_driver --n 262144 --panel 8192 \
        --matrix /scratch/a.bin --progress /scratch/a.progress.json
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="dla-oocore")
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--panel", type=int, default=4096)
    ap.add_argument("--nb", type=int, default=512)
    ap.add_argument("--dtype", default="float32", choices=["float32", "float64"])
    ap.add_argument("--seed", type=int, default=51)
    ap.add_argument("--matrix", default=None, help="disk-backed store path (RAM if omitted)")
    ap.add_argument("--store", default="flat", choices=["flat", "panel"],
                    help="disk layout: 'flat' = square np.memmap; 'panel' = "
                    "panel-blocked lower-triangle-only with O_DIRECT "
                    "sequential I/O (half the bytes, bypasses the page "
                    "cache — the at-scale backend; requires --matrix)")
    ap.add_argument("--progress", default=None, help="resume sidecar JSON path")
    ap.add_argument("--probes", type=int, default=2, help="Freivalds validation probes (0 = skip)")
    ap.add_argument("--orig", default=None,
                    help="disk path for the regenerated-A validation store "
                    "(RAM if omitted; use when 2 matrices exceed host DRAM)")
    ap.add_argument("--ram-cache", action="store_true",
                    help="write-through RAM cache for the panel store: "
                    "reads served from host memory, every write still goes "
                    "to the O_DIRECT file (same durability/resume)")
    ap.add_argument("--bucket", type=int, default=None,
                    help="round streamed panel heights up to a multiple of "
                    "this (panel store only): collapses per-panel jit "
                    "recompiles to ~n/bucket distinct shapes")
    ap.add_argument("--no-prefetch", action="store_true",
                    help="disable the double-buffered k-panel prefetch")
    ap.add_argument("--host-blas", action="store_true",
                    help="run the panel algorithm fully in place with direct "
                    "OpenBLAS calls on the host (no device/XLA) — the fast "
                    "path for single-host CPU-bound at-scale runs")
    ap.add_argument("--p", type=int, default=1, help="mesh rows (PxQ device grid)")
    ap.add_argument("--q", type=int, default=1, help="mesh cols — p*q>1 runs the "
                    "distributed out-of-core path (panels sharded over the mesh)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) before any computation")
    args = ap.parse_args(argv)

    if args.host_blas and (args.bucket or args.p * args.q > 1):
        ap.error("--host-blas excludes --bucket and --p/--q (single-host, "
                 "in-place, no jit shapes)")
    if not args.host_blas:
        import jax

        if args.platform:
            jax.config.update("jax_platforms", args.platform)
        if args.dtype == "float64":
            jax.config.update("jax_enable_x64", True)

    import numpy as np

    from dla_tpu.algos.oocore import potrf_outofcore
    from dla_tpu.runtime.staging import (
        DirectPanelStore,
        HostTileStore,
        freivalds_streaming,
    )
    from dla_tpu.utils.flops import gflops, potrf_flops

    dtype = np.float32 if args.dtype == "float32" else np.float64
    n = args.n
    panel_store = args.store == "panel"
    if panel_store and not args.matrix:
        ap.error("--store panel requires --matrix")
    item = np.dtype(dtype).itemsize
    gib = (n * (n + args.panel) // 2 if panel_store else n * n) * item / 2**30
    print(
        f"[oocore] N={n} panel={args.panel} NB={args.nb} dtype={args.dtype} "
        f"store={args.store}:{args.matrix or 'ram'} ({gib:.1f} GiB)",
        flush=True,
    )
    if panel_store:
        store = DirectPanelStore(n, dtype, path=args.matrix, panel=args.panel,
                                 ram_cache=args.ram_cache)
        if not store.direct:
            print("[oocore] note: filesystem rejected O_DIRECT, buffered I/O",
                  flush=True)
    else:
        store = HostTileStore(n, dtype, path=args.matrix)
    fresh = args.progress is None or not __import__("os").path.exists(args.progress)
    if fresh:
        print("[oocore] generating SPD matrix (native, seeded)...", flush=True)
        gen0 = time.perf_counter()
        store.fill_plgsy(seed=args.seed)
        print(f"[oocore] generated in {time.perf_counter() - gen0:.1f}s",
              flush=True)

    mesh = None
    if not args.host_blas and args.p * args.q > 1:
        from dla_tpu.parallel import make_mesh

        mesh = make_mesh(args.p, args.q)
        print(f"[oocore] distributed: panels sharded over a {args.p}x{args.q} mesh",
              flush=True)

    t0 = time.perf_counter()
    stats = potrf_outofcore(
        store,
        panel=args.panel,
        nb=args.nb,
        progress_path=args.progress,
        prefetch=not args.no_prefetch,
        mesh=mesh,
        height_bucket=args.bucket,
        host_blas=args.host_blas,
        on_panel=lambda j, np_: print(
            f"[oocore] panel {j + 1}/{np_} done @ {time.perf_counter() - t0:.1f}s",
            flush=True,
        ),
    )
    t1 = time.perf_counter()
    print(f"Elapsed: {(t1 - t0) * 1e3:.1f} ms")
    npan_total = n // args.panel
    if stats["panels"] < npan_total:
        # resumed run: quote the rate over the flops THIS process executed
        # (sum over its panels of update+factor work), not the full n³/3 —
        # the full-problem number would overstate a resume (r3 honesty fix)
        done_before = npan_total - stats["panels"]
        flops_here = 0.0
        for j in range(npan_total):
            ph = n - j * args.panel
            fj = 2.0 * j * ph * args.panel**2 + ph * args.panel**2
            if j >= done_before:
                flops_here += fj
        print(
            f"Performance: {gflops(flops_here, t1 - t0):.2f} Gflop/s "
            f"(resumed: {stats['panels']}/{npan_total} panels, "
            f"{flops_here / potrf_flops(n) * 100:.0f}% of the flops, "
            f"this process)"
        )
    else:
        print(f"Performance: {gflops(potrf_flops(n), t1 - t0):.2f} Gflop/s")
    if stats["panels"]:
        gib = 2**30
        print(
            "[oocore] staging: "
            f"in {stats['bytes_in'] / gib:.2f} GiB "
            f"(pack {stats['pack_s']:.1f}s @ "
            f"{stats['bytes_in'] / max(stats['pack_s'], 1e-9) / gib:.2f} GiB/s, "
            f"h2d wait {stats['h2d_wait_s']:.1f}s), "
            f"out {stats['bytes_out'] / gib:.2f} GiB "
            f"(writeback {stats['writeback_s']:.1f}s @ "
            f"{stats['bytes_out'] / max(stats['writeback_s'], 1e-9) / gib:.2f} GiB/s"
            + (f", compute sync {stats['sync_s']:.1f}s"
               if stats.get("sync_s") else "")
            + ")",
            flush=True,
        )

    rc = 0
    if args.probes:
        # Regenerate A from the seed for validation (plgsy is deterministic
        # and validation reads only the lower triangles, so no
        # pre-factorization copy of A is needed — validation works the same
        # on fresh runs and after a kill/resume, and peak host memory during
        # the factorization stays at one matrix).
        v0 = time.perf_counter()
        if panel_store:
            # fully streaming: one disk pass over L + regeneration of A
            print("[oocore] streaming Freivalds validation...", flush=True)
            res = freivalds_streaming(store, seed=args.seed, probes=args.probes)
        else:
            print("[oocore] regenerating A for Freivalds validation...",
                  flush=True)
            orig = HostTileStore(n, dtype, path=args.orig)
            orig.fill_plgsy(seed=args.seed)
            res = orig.freivalds_residual(store, probes=args.probes)
            orig.close()
        print(f"freivalds ||(A - LL^T)x|| / (||A|| ||x||) = {res:.2e} "
              f"({time.perf_counter() - v0:.1f}s)")
        gate = 1e-10 if dtype == np.float64 else n * 2e-7
        ok = np.isfinite(res) and res < gate
        print("PASS" if ok else "FAIL", f"(gate {gate:g})")
        rc = 0 if ok else 1
    store.close()
    return rc


if __name__ == "__main__":
    sys.exit(main())
