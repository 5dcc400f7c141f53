"""Round-3 campaign addendum L: packed (triangle-only) storage rows.

Puts the packed formulation through the same driver/CSV/residual-gate
contract as every other campaign row (reference: ``benchmark.c`` sweep
rows): the f32 frontier sizes the dense formulations cannot hold
(N=65536/81920 > the dense f32 limit 61440) and the bf16 packed sizes
past the dense bf16 limit (98304/106496), plus comparison points at
N=32768 where both formulations fit.

Run:  setsid nohup python benchmarks/campaign_r3l.py \
          >> benchmarks/results_r3/campaign.log 2>&1 &
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
    packed = dict(
        modes=("packed",), diag="twolevel", repeats=5,
        timeout_s=2400.0, max_retries=1,
    )
    campaigns = [
        # f32 packed: comparison point + the beyond-dense frontier sizes
        SweepConfig(ns=(32768, 65536, 81920), nbs=(4096,),
                    precision="default", dtypes=("float32",), **packed),
        # NB sensitivity at the comparison point
        SweepConfig(ns=(32768,), nbs=(2048, 8192),
                    precision="default", dtypes=("float32",), **packed),
        # the 3-pass tier through the packed formulation
        SweepConfig(ns=(32768,), nbs=(4096,),
                    precision="high", dtypes=("float32",), **packed),
        # bf16 packed: past the dense bf16 limit
        SweepConfig(ns=(65536, 98304, 106496), nbs=(4096,),
                    precision="default", dtypes=("bfloat16",), **packed),
    ]
    for c in campaigns:
        run_sweep(c, CSV)


if __name__ == "__main__":
    main()
