"""Campaign rows for the `high` (bf16x3) precision tier — the library
default as of r2 (utils/precision.py). N-scaling at the shipping NB plus
NB-sensitivity at N=28672; diag=twolevel (the measured winner at
default/high tiers, results/micro3_r2.jsonl)."""
import os, sys
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from dla_tpu.bench.harness import SweepConfig, run_sweep

CSV = os.path.join(REPO, "benchmarks", "results_r2", "sweep.csv")
common = dict(dtypes=("float32",), modes=("shrink",), panel="blocktrsm",
              trailing="pallas", precision="high", diag="twolevel",
              repeats=8, timeout_s=2400.0, max_retries=1)
total = 0
total += len(run_sweep(SweepConfig(
    ns=(4096, 8192, 16384, 28672, 32768), nbs=(4096,), **common), CSV))
total += len(run_sweep(SweepConfig(
    ns=(28672,), nbs=(1024, 2048), **common), CSV))
print(f"[probe-high] wrote {total} rows", flush=True)
