#!/bin/bash
set -u
cd /root/repo
R=benchmarks/results_r5
echo "[runner-b] mosaic df64 v2 (fixed reference)" >> "$R/runner.log"
timeout 3600 python benchmarks/ring_mosaic_compile_r5.py > "$R/ring_mosaic_df64_v2.log" 2>&1
echo "[runner-b] mosaic-v2 rc=$?" >> "$R/runner.log"
echo "[runner-b] serving v3 (fixed denominator)" >> "$R/runner.log"
timeout 3600 python benchmarks/df64_serving_probe.py > "$R/df64_serving3.log" 2>&1
echo "[runner-b] serving3 rc=$?" >> "$R/runner.log"
echo "[runner-b] DONE" >> "$R/runner.log"
