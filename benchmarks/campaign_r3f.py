"""Round-3 campaign addendum F: full-K (kb=nb) rows on the HBM-bound
tiers — the session-2 finding (results_r3/trailing_tb.jsonl: +16% at the
default tier) through the driver/CSV contract, including the bf16
north-star size N=65536.

Run:  nohup python benchmarks/campaign_r3f.py >> benchmarks/results_r3/campaign.log 2>&1 &
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
        # default tier, full-K at the NB=4096 frontier, N axis
        SweepConfig(ns=(16384, 32768, 49152), nbs=(4096,), kb=4096,
                    precision="default", dtypes=("float32",), **base),
        # bf16 policy, full-K, incl. the in-core north-star size
        SweepConfig(ns=(32768, 65536), nbs=(4096,), kb=4096,
                    precision="default", dtypes=("bfloat16",), **base),
    ]
    for c in campaigns:
        run_sweep(c, CSV)


if __name__ == "__main__":
    main()
