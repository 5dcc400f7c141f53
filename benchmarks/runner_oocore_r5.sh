#!/bin/bash
# Session-6 restart of the at-scale out-of-core run: the VM reset wiped
# /root/oocore_r4 at panel 22/44. The store now lives INSIDE the repo
# tree (gitignored) so the next reset cannot take it; the sidecar makes
# the run resumable across this session's end.
# Launch: setsid nohup benchmarks/runner_oocore_r5.sh > /dev/null 2>&1 &
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/results_r3/oocore_n180224.log
echo "[oocore] === session-6 restart (store wiped by VM reset; fresh run, store in-repo) ===" >> "$LOG"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
python -m dla_tpu.cli.oocore_driver \
  --n 180224 --panel 4096 --nb 1024 --dtype float32 \
  --store panel --matrix oocore_r5/a180224.panels \
  --progress oocore_r5/a180224.progress.json \
  --platform cpu --probes 2 --host-blas >> "$LOG" 2>&1
echo "[oocore] driver rc=$? (session-6)" >> "$LOG"
