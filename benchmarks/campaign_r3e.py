"""Round-3 campaign addendum E: dense small/mid-N grid at the inplace
formulation across tiers — cheap rows (seconds each on the chip) that
push the cumulative campaign toward the reference's 1,680-row scale
(``results/bench.csv``) while mapping the N×NB frontier surface below
the headline size.

Run:  nohup python benchmarks/campaign_r3e.py >> benchmarks/results_r3/campaign.log 2>&1 &
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
        timeout_s=1800.0, max_retries=1,
    )
    ns = (4096, 8192, 12288, 20480)
    campaigns = [
        # high tier: NB sensitivity below the frontier (kb = full-K at
        # each NB — the late-r3 finding)
        SweepConfig(ns=ns, nbs=(1024,), kb=1024, precision="high",
                    dtypes=("float32",), **base),
        SweepConfig(ns=ns, nbs=(2048,), kb=1024, precision="high",
                    dtypes=("float32",), **base),
        # default tier at its NB=4096 frontier (4096 doesn't divide 12288
        # evenly? 12288 = 3*4096 — fine; 20480 = 5*4096 — fine)
        SweepConfig(ns=ns, nbs=(4096,), kb=1024, precision="default",
                    dtypes=("float32",), **base),
        SweepConfig(ns=ns, nbs=(2048,), kb=1024, precision="default",
                    dtypes=("float32",), **base),
        # bf16 policy on the same grid
        SweepConfig(ns=ns, nbs=(4096,), kb=1024, precision="default",
                    dtypes=("bfloat16",), **base),
    ]
    for c in campaigns:
        run_sweep(c, CSV)


if __name__ == "__main__":
    main()
