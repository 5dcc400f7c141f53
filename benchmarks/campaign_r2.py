"""Round-2 TPU benchmark campaign (VERDICT #6).

N ∈ {4k, 8k, 16k, 28k} × NB ∈ {1k, 2k, 4k} × {shrink, blocked} ×
{highest, default}, 8 repeats per config (repeat 0 = compile/calibration,
7 timed — the aggregation ``plot_grid_all.py:45-49`` medians over). One
fork per config with in-process repeats (a fork per repeat would pay the
~1-4 min remote XLA compile 8×; documented deviation from ``benchmark.c``'s
per-repeat fork, whose purpose was StarPU calibration control).

Run:  nohup python benchmarks/campaign_r2.py > results/campaign_r2.log 2>&1 &
Resumable: re-running skips rows already in the CSV.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from dla_tpu.bench.harness import SweepConfig, run_sweep  # noqa: E402

CSV = os.path.join(REPO, "benchmarks", "results_r2", "sweep.csv")


def main():
    common = dict(
        ns=(4096, 8192, 16384, 28672),
        nbs=(1024, 2048, 4096),
        dtypes=("float32",),
        repeats=8,
        timeout_s=2400.0,
        max_retries=1,
    )
    campaigns = [
        # the shipping shrink path at both honest-precision extremes
        SweepConfig(modes=("shrink",), panel="blocktrsm", trailing="pallas",
                    diag="lax", precision="highest", **common),
        SweepConfig(modes=("shrink",), panel="blocktrsm", trailing="pallas",
                    diag="twolevel", precision="default", **common),
        # the DUS-unrolled blocked formulation, small N only (its unrolled
        # per-op dynamic-update-slice chains take many minutes of remote
        # compile per config at larger N — ROADMAP negative results)
        SweepConfig(ns=(4096, 8192), nbs=(1024, 2048), dtypes=("float32",),
                    modes=("blocked",), panel="xla", trailing="xla",
                    diag="lax", precision="highest", repeats=8,
                    timeout_s=2400.0, max_retries=1),
        # distributed rows (the r1 campaign had none): block-cyclic shard_map
        # POTRF on the virtual CPU fleet, honestly labeled device=cpu —
        # the 2x4 and 2x2 PxQ grids the dryrun exercises, fp64 to the gate
        SweepConfig(ns=(1024, 2048), nbs=(64, 128), dtypes=("float64",),
                    modes=("distributed",), meshes=((2, 4), (2, 2)),
                    platform="cpu", repeats=8, timeout_s=900.0,
                    max_retries=1),
    ]
    total = 0
    for cfg in campaigns:
        rows = run_sweep(cfg, CSV)
        total += len(rows)
    print(f"[campaign] wrote {total} new rows to {CSV}", flush=True)


if __name__ == "__main__":
    main()
