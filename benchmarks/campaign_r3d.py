"""Round-3 campaign addendum D: the N axis at the per-tier frontier
configs (high:inplace NB=1024 kb=1024, default:inplace NB=4096 kb=1024,
bf16:inplace NB=4096 kb=1024).

Two purposes: (1) campaign growth toward the reference's 1,680-row scale
(``results/bench.csv``) along the axis the reference itself swept hardest
(N at fixed best NB, ``benchmark.c:76-80``); (2) fresh measured points
for the projection model's single-chip rate curve
(``parallel/model.py::SINGLE_CHIP_HIGH_GFLOPS``) at the late-r3 frontier
formulation, replacing the pre-kb curve.

Run:  nohup python benchmarks/campaign_r3d.py >> benchmarks/results_r3/campaign.log 2>&1 &
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
        # high-tier frontier N axis (NB=1024 divides all of these; N=49152
        # is the fp32 in-core frontier from campaign_r3b)
        SweepConfig(ns=(8192, 16384, 24576, 40960, 49152), nbs=(1024,),
                    kb=1024, precision="high", dtypes=("float32",), **base),
        # default-tier frontier N axis (NB=4096)
        SweepConfig(ns=(8192, 16384, 24576, 40960, 49152), nbs=(4096,),
                    kb=1024, precision="default", dtypes=("float32",), **base),
        # bf16 policy N axis, through the north-star size
        SweepConfig(ns=(16384, 49152, 65536), nbs=(4096,), kb=1024,
                    precision="default", dtypes=("bfloat16",), **base),
    ]
    for c in campaigns:
        run_sweep(c, CSV)


if __name__ == "__main__":
    main()
