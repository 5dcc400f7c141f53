#!/bin/bash
# Session-6 TPU sequence (one TPU process at a time — CLAUDE.md):
#   1. resume campaign addendum K (the VM reset killed it mid-flight at
#      the complex64 section; run_sweep skips rows already in the CSV)
#   2. final r3 bench.py verification at the shipping tier specs
# Launch: setsid nohup benchmarks/runner_r3m.sh > /dev/null 2>&1 &
set -u
cd "$(dirname "$0")/.."

python benchmarks/campaign_r3k.py >> benchmarks/results_r3/campaign.log 2>&1
echo "r3k resume done rc=$?" >> benchmarks/results_r3/campaign.log

BENCH_BUDGET_S=1500 python bench.py \
  > benchmarks/results_r3/bench_final_r3s6.log 2>&1
echo "runner_r3m done rc=$?" >> benchmarks/results_r3/campaign.log
