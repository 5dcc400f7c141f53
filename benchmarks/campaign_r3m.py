"""Round-3 campaign addendum M: packed rows with the Pallas trailing.

Addendum-L measured the packed formulation with its XLA per-column
trailing loop; session 11 replaced that hot path with the aliased
single-pass Pallas kernel (`trailing_update_packed`, ~1.9x f32 /
1.19x bf16 on chip — results_r3/packed_probe.jsonl). These rows put
the kernel through the same driver/CSV/residual-gate contract as
every other campaign row (reference: ``benchmark.c`` sweep rows).

In the CSV the Pallas-trailing packed rows are the mode=packed rows
with a non-empty ``kb`` column (kb=NB = full-K, the measured frontier
setting); addendum-L's XLA-trailing rows have kb="".

Run:  setsid nohup python benchmarks/campaign_r3m.py \
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
        trailing="pallas", kb=4096,
        timeout_s=2400.0, max_retries=1,
    )
    campaigns = [
        # f32: dense-comparison point + the beyond-dense frontier sizes
        SweepConfig(ns=(32768, 65536, 73728, 81920), nbs=(4096,),
                    precision="default", dtypes=("float32",), **packed),
        # the 3-pass tier through the packed+pallas formulation
        SweepConfig(ns=(32768,), nbs=(4096,),
                    precision="high", dtypes=("float32",), **packed),
        # bf16: past the dense bf16 limit
        SweepConfig(ns=(65536, 98304, 106496), nbs=(4096,),
                    precision="default", dtypes=("bfloat16",), **packed),
    ]
    for c in campaigns:
        run_sweep(c, CSV)


if __name__ == "__main__":
    main()
