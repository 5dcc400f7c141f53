#!/bin/bash
# Sequential TPU work chain for the late-r3 session-4 probes (one TPU
# process at a time — CLAUDE.md compile-service rule):
#   1. wait for the in-flight probe_frontier2 bench run to finish
#   2. probe the fp32 in-core limit N=61440 at the high tier (may OOM —
#      that is the frontier evidence either way)
#   3. campaign addendum H (curve densification + grid gaps)
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/results_r3/probe_frontier2.log

PROBE_PID=$(cat /tmp/probe.pid 2>/dev/null || echo 0)
for i in $(seq 1 120); do
  grep -q '"metric"' "$LOG" && break
  ps -p "$PROBE_PID" >/dev/null 2>&1 || break
  sleep 20
done

BENCH_PRECISIONS="high:inplace:1024:1024:61440" BENCH_BUDGET_S=900 \
  python bench.py > benchmarks/results_r3/probe_frontier_n61440.log 2>&1

python benchmarks/campaign_r3h.py >> benchmarks/results_r3/campaign.log 2>&1
echo "runner_r3h done rc=$?" >> benchmarks/results_r3/campaign.log
