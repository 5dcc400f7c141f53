"""Round-2 frontier probes: N=32768 in-core (shrink peak ~2N^2 now fits
HBM) and NB=7168 at N=28672 (the r1 NB frontier, retested with the
blocked-TRSM panel). Rows land in the campaign CSV."""
import os, sys
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from dla_tpu.bench.harness import SweepConfig, run_sweep

CSV = os.path.join(REPO, "benchmarks", "results_r2", "sweep.csv")
common = dict(dtypes=("float32",), modes=("shrink",), panel="blocktrsm",
              trailing="pallas", repeats=8, timeout_s=2400.0, max_retries=1)
total = 0
for prec, diag in (("highest", "lax"), ("default", "twolevel")):
    total += len(run_sweep(SweepConfig(ns=(32768,), nbs=(4096,),
                 precision=prec, diag=diag, **common), CSV))
    total += len(run_sweep(SweepConfig(ns=(28672,), nbs=(7168,),
                 precision=prec, diag=diag, **common), CSV))
print(f"[probe] wrote {total} rows", flush=True)
