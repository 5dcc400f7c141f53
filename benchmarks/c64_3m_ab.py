"""c64 trailing A/B: 3-real-GEMM Karatsuba (DLA_TPU_C3M=1) vs the naive
complex lowering (=0) — VERDICT r4 weak #5.

r4 characterized the c64 XLA-fallback path at ~0.21x the f32 rate per
logical flop (5.36 TF/s @N=16384); the 3M path (ops/blas.py::_gemm3m_nt)
replaces every complex trailing GEMM's 4-real-GEMM lowering with 3 real
dots that run at the library's pinned bf16x3 MXU precision. The flag is
read at TRACE time, so each arm runs in its own driver subprocess (fresh
trace); both arms re-use the shared compile cache across repeats.

Run:  setsid nohup python benchmarks/c64_3m_ab.py \
        > benchmarks/results_r5/c64_3m_ab.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUTDIR = os.path.join(REPO, "benchmarks", "results_r5")
OUT = os.path.join(OUTDIR, "c64_3m_ab.jsonl")


def log(*a):
    print(*a, flush=True)


def emit(row):
    os.makedirs(OUTDIR, exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    log("ROW", json.dumps(row))


def run_arm(n: int, nb: int, c3m: str):
    env = dict(os.environ)
    env["DLA_TPU_C3M"] = c3m
    cmd = [sys.executable, "-m", "dla_tpu.cli.potrf_driver",
           "--n", str(n), "--nb", str(nb), "--dtype", "c",
           "--mode", "shrink"]
    t0 = time.perf_counter()
    r = subprocess.run(cmd, capture_output=True, text=True,
                       timeout=3600, env=env, cwd=REPO)
    wall = time.perf_counter() - t0
    out = r.stdout + r.stderr
    perf = re.search(r"Performance: ([0-9.]+) Gflop/s", out)
    res = re.search(r"= ([0-9.e+-]+)\n", out)
    row = {"kind": "c64_3m_ab", "n": n, "nb": nb, "c3m": c3m,
           "rc": r.returncode, "wall_s": round(wall, 1),
           "gflops": float(perf.group(1)) if perf else None,
           "residual": float(res.group(1)) if res else None}
    if r.returncode != 0 and not perf:
        row["tail"] = out[-400:]
    emit(row)
    return row


def main():
    n = int(os.environ.get("C3M_N", 16384))
    nb = int(os.environ.get("C3M_NB", 1024))
    # interleaved repeats: 0,1,0,1 — steadies against service drift
    for rep in range(2):
        for c3m in ("0", "1"):
            log(f"=== rep {rep} c3m={c3m} ===")
            run_arm(n, nb, c3m)
    log("c64 3M A/B complete")


if __name__ == "__main__":
    main()
