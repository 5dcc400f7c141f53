#!/bin/bash
# Late-r3 session-5 TPU sequence (one TPU process at a time — CLAUDE.md):
#   1. wait for campaign addendum K (pid passed as $1) to finish
#   2. final r3 bench.py verification at the shipping tier specs
# Launch: setsid nohup benchmarks/runner_r3l.sh <campaign_pid> > /dev/null 2>&1 &
set -u
cd "$(dirname "$0")/.."
PID=${1:?campaign pid}

while ps -p "$PID" -o args= 2>/dev/null | grep -q campaign_r3k; do
  sleep 60
done

BENCH_BUDGET_S=1200 python bench.py \
  > benchmarks/results_r3/bench_final_r3s5.log 2>&1
echo "runner_r3l done rc=$?" >> benchmarks/results_r3/campaign.log
