"""Round-3 campaign addendum J: hardware-evidence gaps.

Sections:
  - complex64 rows ON THE TPU CHIP (the c/z dtype map so far had CPU
    scipy-gated tests only; z/complex128 stays off-TPU — fp64 silently
    degrades on this path, CLAUDE.md): shrink formulation, XLA
    panel/trailing, lax diag
  - cross-reboot stability: the session-2 high-tier frontier config
    (inplace NB=1024 full-K, N=32768) repeated after the VM reset —
    the reference's repo-best was likewise a stability-checked config
  - default-tier fp32 at the N=61440 in-core limit (is the default
    frontier also the memory limit, like the high tier's?)
  - highest-tier inplace at a frontier size (the exact-fp32 tier's
    N-scaling; bench.py keeps the r1/r2-comparable shrink@32768 spec)

Run:  setsid nohup python benchmarks/campaign_r3j.py >> benchmarks/results_r3/campaign.log 2>&1 &
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
    campaigns = [
        # complex64 on the chip (3-matmul complex GEMM decomposition on
        # the MXU; residual gate is the fp32-scale dtype-aware default)
        SweepConfig(ns=(8192, 16384), nbs=(1024,), dtypes=("complex64",),
                    modes=("shrink",), diag="lax", repeats=8,
                    timeout_s=2400.0, max_retries=1),
        # cross-reboot stability at the session-2 headline config
        SweepConfig(ns=(32768,), nbs=(1024,), kb=1024, precision="high",
                    dtypes=("float32",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=2400.0,
                    max_retries=1),
        # default tier at the fp32 in-core limit
        SweepConfig(ns=(61440,), nbs=(4096,), kb=4096, precision="default",
                    dtypes=("float32",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=2400.0,
                    max_retries=1),
        # highest tier at a frontier size
        SweepConfig(ns=(57344,), nbs=(1024,), kb=1024, precision="highest",
                    dtypes=("float32",), modes=("inplace",),
                    diag="twolevel", repeats=8, timeout_s=2400.0,
                    max_retries=1),
    ]
    for c in campaigns:
        run_sweep(c, CSV)


if __name__ == "__main__":
    main()
