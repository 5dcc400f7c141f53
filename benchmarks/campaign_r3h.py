"""Round-3 campaign addendum H: densify the measured single-chip curve
and close the remaining grid gaps at the frontier configs.

Sections:
  - high:inplace NB=1024 full-K N-axis (8192..40960) — the measured
    frontier curve at the headline tier (feeds/validates the
    ``parallel/model.py`` single-chip rate table empirically)
  - highest-tier inplace rows (shrink-vs-inplace comparison at the
    exact-fp32 tier, untested so far)
  - bf16 NB sensitivity at N=32768 (NB=2048/8192 full-K around the
    4096 frontier)
  - default-tier NB sensitivity at the new N=57344 frontier point

Run:  setsid nohup python benchmarks/campaign_r3h.py >> benchmarks/results_r3/campaign.log 2>&1 &
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
        # high-tier frontier curve, N axis at NB=1024 full-K
        SweepConfig(ns=(8192, 12288, 16384, 20480, 24576, 28672, 40960),
                    nbs=(1024,), kb=1024,
                    precision="high", dtypes=("float32",), **base),
        # highest tier through inplace (shrink is the bench.py config)
        SweepConfig(ns=(16384, 32768), nbs=(1024,), kb=1024,
                    precision="highest", dtypes=("float32",), **base),
        # bf16 NB sensitivity around the 4096 frontier (full-K each)
        SweepConfig(ns=(32768,), nbs=(2048,), kb=2048,
                    precision="default", dtypes=("bfloat16",), **base),
        SweepConfig(ns=(32768,), nbs=(8192,), kb=8192,
                    precision="default", dtypes=("bfloat16",), **base),
        # default-tier NB sensitivity at the new N=57344 frontier
        SweepConfig(ns=(57344,), nbs=(2048,), kb=2048,
                    precision="default", dtypes=("float32",), **base),
        SweepConfig(ns=(57344,), nbs=(8192,), kb=8192,
                    precision="default", dtypes=("float32",), **base),
    ]
    for c in campaigns:
        run_sweep(c, CSV)


if __name__ == "__main__":
    main()
