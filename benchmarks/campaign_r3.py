"""Round-3 TPU benchmark campaign (VERDICT r3 #7 — grow toward the
reference's 1,680-row campaign scale; cumulative target ≥700 rows).

Sections (all shipping-path shrink unless noted, 8 repeats per config,
repeat 0 = compile/calibration — medians exclude it, the
``plot_grid_all.py:45-49`` aggregation):

1. default-tier NB sensitivity — the r2 campaign swept default only to
   NB≤4096; this completes the grid through the shipping NB=8192 and the
   N=24576 column (VERDICT #7 "NB sensitivity at default").
2. high-tier NB=8192 column across N — headline-config stability rows in
   a FRESH process per config (vs r2's probe rows and bench.py's runs:
   cross-process, cross-day evidence).
3. intermediate-N default rows (12288, 20480) — densifies the perf-grid
   N axis toward the reference's 14-point sweep (``benchmark.c:76-101``).
4. single-buffer ``inplace`` formulation rows (``potrf_inplace``):
   f32/high (formulation cost vs shrink) and bf16-storage/default (the
   split-precision policy from the r3 bf16 study) — through the same
   driver/CSV contract as every other row, incl. the √N·eps_bf16 gate.
5. the fp32 in-core frontier at default tier: N=40960 (shrink peak
   ≈2.5·N² = 15.6 GiB of 15.75 — the largest NB=8192 multiple that fits).

Run:  nohup python benchmarks/campaign_r3.py > benchmarks/results_r3/campaign.log 2>&1 &
Resumable: re-running skips rows already in the CSV.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from dla_tpu.bench.harness import SweepConfig, run_sweep  # noqa: E402

CSV = os.path.join(REPO, "benchmarks", "results_r3", "sweep.csv")


def main():
    shrink = dict(
        modes=("shrink",), panel="blocktrsm", trailing="pallas",
        diag="twolevel", dtypes=("float32",), repeats=8,
        timeout_s=2400.0, max_retries=1,
    )
    campaigns = [
        # 1. default-tier NB grid incl. the shipping NB=8192 (19 configs)
        SweepConfig(ns=(4096, 8192, 16384, 24576, 32768),
                    nbs=(1024, 2048, 4096, 8192),
                    precision="default", **shrink),
        # 2. high-tier NB=8192 column (4 configs; N=32768 row = the
        # headline config re-measured in a fresh process)
        SweepConfig(ns=(8192, 16384, 24576, 32768), nbs=(8192,),
                    precision="high", **shrink),
        SweepConfig(ns=(24576,), nbs=(2048, 4096), precision="high",
                    **shrink),
        # 3. densify the N axis at default (4 configs)
        SweepConfig(ns=(12288, 20480), nbs=(2048, 4096),
                    precision="default", **shrink),
        # 4. inplace-formulation rows (6 configs)
        SweepConfig(ns=(8192, 16384, 32768), nbs=(8192,),
                    modes=("inplace",), diag="twolevel", precision="high",
                    dtypes=("float32",), repeats=8, timeout_s=2400.0,
                    max_retries=1),
        SweepConfig(ns=(8192, 16384, 32768), nbs=(8192,),
                    modes=("inplace",), diag="twolevel",
                    precision="default", dtypes=("bfloat16",), repeats=8,
                    timeout_s=2400.0, max_retries=1),
        # 5. fp32 in-core frontier at default. shrink at N=40960 is
        # infeasible (measured: child dies before repeat 0 — peak
        # ≈2.5·N² = 15.6 GiB plus temporaries exceeds the 15.75 GiB chip;
        # the failed row stays in the CSV as the frontier evidence). The
        # single-buffer inplace formulation (peak ≈ N² + one panel)
        # carries the fp32 frontier to N=49152 (9.2 GiB) instead.
        SweepConfig(ns=(40960, 49152), nbs=(8192,),
                    modes=("inplace",), diag="twolevel",
                    precision="default", dtypes=("float32",), repeats=8,
                    timeout_s=2400.0, max_retries=1),
    ]
    total = 0
    for cfg in campaigns:
        rows = run_sweep(cfg, CSV)
        total += len(rows)
    print(f"[campaign] wrote {total} new rows to {CSV}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
