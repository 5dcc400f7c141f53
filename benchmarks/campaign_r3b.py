"""Round-3 campaign extension: the inplace NB frontier (late-r3 sweep).

The bench-level sweep (`results_r3/inplace_nb_sweep.jsonl`) found the NB
frontier is formulation-dependent: shrink wants NB=8192 (it pays an
O(N²) trailing-square rewrite per panel step) while the single-buffer
``potrf_inplace`` wants NB≈2048 (no rewrite term, so shifting
panel-solve flops into the faster Pallas trailing kernel wins). These
rows put that finding through the same driver/CSV/residual-gate contract
as every other campaign row (reference: ``benchmark.c`` sweep rows).

Run:  nohup python benchmarks/campaign_r3b.py >> benchmarks/results_r3/campaign.log 2>&1 &
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
    inplace = dict(
        modes=("inplace",), diag="twolevel", repeats=8,
        timeout_s=2400.0, max_retries=1,
    )
    campaigns = [
        # high-tier inplace NB frontier (the new headline config is
        # N=32768 NB=2048)
        SweepConfig(ns=(16384, 32768), nbs=(2048, 4096),
                    precision="high", dtypes=("float32",), **inplace),
        # does the frontier also move for the bf16 split-precision policy?
        SweepConfig(ns=(32768,), nbs=(2048, 4096),
                    precision="default", dtypes=("bfloat16",), **inplace),
        # fp32 frontier size at the frontier NB
        SweepConfig(ns=(49152,), nbs=(2048,),
                    precision="default", dtypes=("float32",), **inplace),
    ]
    for c in campaigns:
        run_sweep(c, CSV)


if __name__ == "__main__":
    main()
