"""Round-3 campaign addendum I: N-axis curves for the HBM-bound tiers
and a small-N dense grid — grows the cumulative campaign toward the
reference's 1,680-row scale (results/bench.csv) with informative rows.

Sections:
  - default-tier inplace full-K N-axis at the NB=4096 frontier
    (fills the curve between addendum G's 16384..57344 anchors)
  - bf16-policy N-axis at NB=4096 full-K (curve below the 65536
    north-star point)
  - highest-tier inplace N-axis extremes (with addendum H's 16384/32768
    this gives a 4-point shrink-vs-inplace comparison at the exact tier)
  - high-tier NB sensitivity at N=16384 full-K (512/2048/4096 around
    the 1024 frontier)
  - small-N dense grid (the reference's sweep starts at N=1000-4000;
    these rows anchor the low end of every curve)

Run:  setsid nohup python benchmarks/campaign_r3i.py >> benchmarks/results_r3/campaign.log 2>&1 &
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
        # default-tier N-axis at the NB=4096 frontier, full-K
        SweepConfig(ns=(8192, 12288, 20480, 24576, 40960), nbs=(4096,),
                    kb=4096, precision="default", dtypes=("float32",),
                    **base),
        # bf16-policy N-axis at NB=4096 full-K
        SweepConfig(ns=(8192, 16384, 24576, 40960, 57344), nbs=(4096,),
                    kb=4096, precision="default", dtypes=("bfloat16",),
                    **base),
        # highest-tier inplace N-axis extremes
        SweepConfig(ns=(8192, 24576), nbs=(1024,), kb=1024,
                    precision="highest", dtypes=("float32",), **base),
        # high-tier NB sensitivity at N=16384, full-K each
        SweepConfig(ns=(16384,), nbs=(512,), kb=512,
                    precision="high", dtypes=("float32",), **base),
        SweepConfig(ns=(16384,), nbs=(2048,), kb=2048,
                    precision="high", dtypes=("float32",), **base),
        SweepConfig(ns=(16384,), nbs=(4096,), kb=4096,
                    precision="high", dtypes=("float32",), **base),
        # small-N dense grid (low-end curve anchors)
        SweepConfig(ns=(2048, 4096), nbs=(256, 512), kb=None,
                    precision="default", dtypes=("float32",), **base),
        SweepConfig(ns=(2048, 4096), nbs=(256, 512), kb=None,
                    precision="high", dtypes=("float32",), **base),
    ]
    for c in campaigns:
        run_sweep(c, CSV)


if __name__ == "__main__":
    main()
