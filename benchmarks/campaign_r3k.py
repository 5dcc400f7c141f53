"""Round-3 campaign addendum K: grid completion to reference scale.

The reference published 1,680 recorded runs (``results/bench.csv``,
SURVEY §6); after addenda A-J the rebuild's cumulative campaign is at
1,059 rows (+25 r1). This addendum fills the remaining coverage holes in
the (N, NB, dtype, formulation, tier) grid — the same axes the reference
swept (N × NB × mapping × scheduler, ``benchmark.c:76-103``) — to push
the cumulative campaign past the reference's row count with *new*
measurements, not repeats:

  - the ``inplace`` formulation at small/mid N across all three fp32
    tiers (so the formulation comparison has a full curve, not just the
    frontier points)
  - NB=512 rows (the bottom of the reference's own NB sweep; known to be
    past the per-wave-overhead optimum — grid evidence, not a frontier
    candidate)
  - N-axis densification at 5120/6144/7168/10240/12288/14336/18432/
    20480/22528 (odd-multiple sizes exercise non-power-of-2 tiling)
  - bf16-storage rows at small/mid N (the bf16 curve so far starts at
    32768)
  - complex64 on-chip rows at more sizes (addendum J covered 8192/16384)

Ordered cheap→expensive so an interrupted run still lands the bulk.
Resumable: re-running skips rows already in the CSV.

Run:  setsid nohup python benchmarks/campaign_r3k.py >> benchmarks/results_r3/campaign.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from dla_tpu.bench.harness import SweepConfig, run_sweep  # noqa: E402

CSV = os.path.join(REPO, "benchmarks", "results_r3", "sweep_kb.csv")


def main():
    campaigns = [
        # --- small-N inplace grid, all three fp32 tiers -------------------
        SweepConfig(ns=(4096, 8192, 12288, 16384), nbs=(1024, 2048),
                    precision="default", dtypes=("float32",),
                    modes=("inplace",), diag="twolevel", repeats=8,
                    timeout_s=1800.0, max_retries=1),
        SweepConfig(ns=(4096, 12288), nbs=(4096,), precision="default",
                    dtypes=("float32",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=1800.0,
                    max_retries=1),
        SweepConfig(ns=(8192, 12288), nbs=(2048, 4096), precision="high",
                    dtypes=("float32",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=1800.0,
                    max_retries=1),
        SweepConfig(ns=(8192, 12288, 20480), nbs=(1024, 2048),
                    precision="highest", dtypes=("float32",),
                    modes=("inplace",), diag="twolevel", repeats=8,
                    timeout_s=1800.0, max_retries=1),
        # --- NB=512 (bottom of the reference's own NB sweep) --------------
        SweepConfig(ns=(4096, 8192, 16384), nbs=(512,), precision="default",
                    dtypes=("float32",), modes=("shrink",), diag="lax",
                    repeats=8, timeout_s=1800.0, max_retries=1),
        SweepConfig(ns=(4096, 8192, 16384), nbs=(512,), precision="high",
                    dtypes=("float32",), modes=("shrink",), diag="lax",
                    repeats=8, timeout_s=1800.0, max_retries=1),
        SweepConfig(ns=(8192, 16384), nbs=(512,), precision="high",
                    dtypes=("float32",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=1800.0,
                    max_retries=1),
        # --- N-axis densification (odd-multiple sizes) --------------------
        SweepConfig(ns=(5120, 7168), nbs=(1024,), precision="high",
                    dtypes=("float32",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=1800.0,
                    max_retries=1),
        SweepConfig(ns=(5120, 7168), nbs=(1024,), precision="default",
                    dtypes=("float32",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=1800.0,
                    max_retries=1),
        SweepConfig(ns=(6144, 10240, 14336), nbs=(1024, 2048),
                    precision="high", dtypes=("float32",),
                    modes=("inplace",), diag="twolevel", repeats=8,
                    timeout_s=1800.0, max_retries=1),
        SweepConfig(ns=(6144, 10240, 14336), nbs=(1024, 2048),
                    precision="default", dtypes=("float32",),
                    modes=("inplace",), diag="twolevel", repeats=8,
                    timeout_s=1800.0, max_retries=1),
        SweepConfig(ns=(18432, 22528), nbs=(1024, 2048), precision="high",
                    dtypes=("float32",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=1800.0,
                    max_retries=1),
        SweepConfig(ns=(18432, 22528), nbs=(2048,), precision="default",
                    dtypes=("float32",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=1800.0,
                    max_retries=1),
        # --- mid-N inplace grid holes --------------------------------------
        SweepConfig(ns=(20480, 24576, 28672), nbs=(2048,), precision="high",
                    dtypes=("float32",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=1800.0,
                    max_retries=1),
        SweepConfig(ns=(20480, 28672), nbs=(4096,), precision="high",
                    dtypes=("float32",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=1800.0,
                    max_retries=1),
        SweepConfig(ns=(20480, 24576), nbs=(2048,), precision="default",
                    dtypes=("float32",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=1800.0,
                    max_retries=1),
        SweepConfig(ns=(24576,), nbs=(1024,), precision="default",
                    dtypes=("float32",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=1800.0,
                    max_retries=1),
        # --- bf16-storage small/mid-N curve --------------------------------
        SweepConfig(ns=(8192, 16384), nbs=(1024, 2048), precision="default",
                    dtypes=("bfloat16",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=1800.0,
                    max_retries=1),
        SweepConfig(ns=(12288, 24576), nbs=(4096,), precision="default",
                    dtypes=("bfloat16",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=1800.0,
                    max_retries=1),
        SweepConfig(ns=(20480, 28672, 40960), nbs=(4096,),
                    precision="default", dtypes=("bfloat16",),
                    modes=("inplace",), diag="twolevel", repeats=8,
                    timeout_s=1800.0, max_retries=1),
        SweepConfig(ns=(49152,), nbs=(2048, 8192), precision="default",
                    dtypes=("bfloat16",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=2400.0,
                    max_retries=1),
        # --- complex64 on-chip at more sizes -------------------------------
        SweepConfig(ns=(4096, 12288, 24576), nbs=(1024,),
                    dtypes=("complex64",), modes=("shrink",), diag="lax",
                    repeats=8, timeout_s=2400.0, max_retries=1),
        # --- remaining grid holes ------------------------------------------
        SweepConfig(ns=(4096, 8192), nbs=(512,), precision="highest",
                    dtypes=("float32",), modes=("shrink",), diag="lax",
                    repeats=8, timeout_s=1800.0, max_retries=1),
        SweepConfig(ns=(16384,), nbs=(2048,), precision="highest",
                    dtypes=("float32",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=1800.0,
                    max_retries=1),
        SweepConfig(ns=(28672,), nbs=(2048,), precision="default",
                    dtypes=("float32",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=1800.0,
                    max_retries=1),
        SweepConfig(ns=(24576,), nbs=(4096,), precision="high",
                    dtypes=("float32",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=1800.0,
                    max_retries=1),
        SweepConfig(ns=(36864,), nbs=(4096,), precision="default",
                    dtypes=("bfloat16",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=1800.0,
                    max_retries=1),
    ]
    total = 0
    for c in campaigns:
        for n in c.ns:
            total += sum(1 for nb in c.nbs if n % nb == 0) * len(c.dtypes)
    print(f"[r3k] planned configs ≈ {total} ({total * 8} rows)", flush=True)
    for c in campaigns:
        run_sweep(c, CSV)
    print("[r3k] addendum K complete", flush=True)


if __name__ == "__main__":
    main()
