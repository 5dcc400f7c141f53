"""Round-3 campaign addendum G: the N-frontier configs through the
driver/CSV contract — supersedes the never-run addendum F (same resume
key space, so F's planned rows are included here).

Sections:
  - full-K (kb=nb) default-tier rows at the NB=4096 frontier (F's rows)
  - bf16 full-K rows incl. the in-core north-star size N=65536
  - the new fp32 in-core frontier N=57344 at both fp32 tiers
    (bench probes: high 59.4 TF/s chained = 94% of the bf16x3 ceiling,
    results_r3/probe_frontier_n57344_high.log)

Run:  nohup python benchmarks/campaign_r3g.py >> benchmarks/results_r3/campaign.log 2>&1 &
Resumable: re-running skips rows already in the CSV.
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
    base = dict(
        modes=("inplace",), diag="twolevel", repeats=8,
        timeout_s=2400.0, max_retries=1,
    )
    campaigns = [
        # high tier at the fp32 in-core frontier (NB=1024 full-K)
        SweepConfig(ns=(57344,), nbs=(1024,), kb=1024,
                    precision="high", dtypes=("float32",), **base),
        # default tier, full-K at the NB=4096 frontier, N axis (ex-F)
        SweepConfig(ns=(16384, 32768, 49152, 57344), nbs=(4096,), kb=4096,
                    precision="default", dtypes=("float32",), **base),
        # bf16 policy, full-K, incl. the in-core north-star size (ex-F)
        SweepConfig(ns=(32768, 49152, 65536), nbs=(4096,), kb=4096,
                    precision="default", dtypes=("bfloat16",), **base),
    ]
    for c in campaigns:
        run_sweep(c, CSV)


if __name__ == "__main__":
    main()
