"""Round-3 campaign addendum: the kb (trailing k-split) frontier axis
through the driver/CSV contract.

The bench-level kb sweep (`results_r3/inplace_nb_sweep.jsonl`) found
full-K trailing at small NB is +7-20% across tiers (headline 51.0 TF/s
at high:inplace NB=1024 kb=1024). These rows re-measure the per-tier
frontier configs through the same subprocess-isolated driver/CSV/
residual-gate contract as every other campaign row (reference:
``benchmark.c`` sweep rows), into a fresh CSV that carries the new
``kb`` column.

Run:  nohup python benchmarks/campaign_r3c.py >> benchmarks/results_r3/campaign.log 2>&1 &
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
    inplace = dict(
        modes=("inplace",), diag="twolevel", repeats=8,
        timeout_s=2400.0, max_retries=1,
    )
    campaigns = [
        # headline frontier: high tier, inplace, full-K at NB=1024; the
        # NB=2048/kb=1024 runner-up; and the N-axis point at 16384
        SweepConfig(ns=(16384, 32768), nbs=(1024,), kb=1024,
                    precision="high", dtypes=("float32",), **inplace),
        SweepConfig(ns=(32768,), nbs=(2048,), kb=1024,
                    precision="high", dtypes=("float32",), **inplace),
        # explicit kb=256 contrast rows at the same NB (the pre-frontier
        # default, so the CSV itself shows the kb effect)
        SweepConfig(ns=(32768,), nbs=(1024,), kb=256,
                    precision="high", dtypes=("float32",), **inplace),
        # default-tier and bf16-policy frontiers
        SweepConfig(ns=(32768,), nbs=(4096,), kb=1024,
                    precision="default", dtypes=("float32",), **inplace),
        SweepConfig(ns=(32768,), nbs=(4096,), kb=1024,
                    precision="default", dtypes=("bfloat16",), **inplace),
        # shrink at its own NB=8192 frontier with kb=1024 (the queued
        # recovery-chain probe, CSV-contract form)
        SweepConfig(ns=(32768,), nbs=(8192,), kb=1024, modes=("shrink",),
                    diag="twolevel", repeats=8, timeout_s=2400.0,
                    max_retries=1, precision="high", dtypes=("float32",)),
    ]
    for c in campaigns:
        run_sweep(c, CSV)


if __name__ == "__main__":
    main()
