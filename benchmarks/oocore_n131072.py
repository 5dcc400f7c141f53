"""At-scale out-of-core campaign (VERDICT r1 #5): N=131072 disk-backed,
double-buffered, with a mid-run SIGKILL + resume, ending in a streaming
Freivalds PASS.

Configuration notes (all measured on this VM, docs/STATUS_r2.md):
- Disk store = the O_DIRECT panel-blocked ``DirectPanelStore`` (35.4 GiB
  lower-triangle layout). ``np.memmap`` is unusable here: page-cache
  insertion costs ~0.2-0.5 ms/page (~18 MB/s effective); O_DIRECT streams
  at ~430-570 MB/s.
- Compute runs on the CPU backend: the TPU tunnel's h2d bandwidth is
  ~46 MB/s, and the left-looking panel stream moves ~366 GB — physically
  infeasible through the tunnel (~92 days), vs ~3 h compute-bound on the
  host core. The framework path is identical either way (same
  ``potrf_outofcore``); rows are honestly labeled device=cpu.

Phase A runs the driver as a child, watches its stdout for the kill-panel
marker, and SIGKILLs it mid-run (a hard crash — no atexit, no flush).
Phase B re-runs the same command line; the progress sidecar + transactional
panel commits resume at the first unfinished panel. The recorded log is the
round artifact (``benchmarks/results_r2/oocore_n131072.log``).
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N = int(os.environ.get("OOC_N", 131072))
PANEL = int(os.environ.get("OOC_PANEL", 4096))
NB = int(os.environ.get("OOC_NB", 1024))
KILL_AT_PANEL = int(os.environ.get("OOC_KILL_AT", 8))  # of N // PANEL
WORKDIR = os.environ.get("OOC_DIR", "/root/oocore_r2")


def cmd() -> list[str]:
    return [
        sys.executable, "-m", "dla_tpu.cli.oocore_driver",
        "--n", str(N), "--panel", str(PANEL), "--nb", str(NB),
        "--dtype", "float32", "--store", "panel",
        "--matrix", os.path.join(WORKDIR, "a.panels"),
        "--progress", os.path.join(WORKDIR, "a.progress.json"),
        "--platform", "cpu", "--probes", "2", "--ram-cache",
        "--bucket", "16384",
    ]


def main() -> int:
    os.makedirs(WORKDIR, exist_ok=True)
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    marker = f"panel {KILL_AT_PANEL}/"

    print(f"[campaign] phase A: run until '{marker}', then SIGKILL", flush=True)
    t0 = time.time()
    child = subprocess.Popen(
        cmd(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env, cwd=REPO,
    )
    killed = False
    for line in child.stdout:
        print(f"  A| {line}", end="", flush=True)
        if marker in line:
            child.send_signal(signal.SIGKILL)  # hard crash mid-run
            killed = True
            print(f"[campaign] SIGKILL after {time.time() - t0:.0f}s "
                  f"(panel {KILL_AT_PANEL})", flush=True)
            break
    child.wait()
    if not killed:
        print(f"[campaign] child exited rc={child.returncode} before the "
              "kill marker — aborting", flush=True)
        return 2

    print("[campaign] phase B: resume from the sidecar", flush=True)
    t1 = time.time()
    child = subprocess.Popen(
        cmd(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env, cwd=REPO,
    )
    for line in child.stdout:
        print(f"  B| {line}", end="", flush=True)
    rc = child.wait()
    print(f"[campaign] resume finished rc={rc} in {time.time() - t1:.0f}s "
          f"(total {time.time() - t0:.0f}s)", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
