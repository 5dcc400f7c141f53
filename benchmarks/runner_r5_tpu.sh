#!/bin/bash
# r5 TPU work queue — ONE TPU process at a time, sequenced inside one
# runner (CLAUDE.md: polling setsid pids is unreliable; chain instead).
# Timeouts are GENEROUS (the service stalls up to ~30 min spontaneously;
# killing an in-flight compile poisons the queue) — they only fire on a
# truly wedged process.
# Launch: setsid nohup benchmarks/runner_r5_tpu.sh > /dev/null 2>&1 &
set -u
cd "$(dirname "$0")/.."
R=benchmarks/results_r5
mkdir -p "$R"

echo "[runner] dense 32768 record cert retry (transient transport err)" >> "$R/runner.log"
DF64RC_PACKED= DF64RC_DENSE=32768 timeout 3600 python benchmarks/df64_record_cert.py > "$R/dense_cert_freivalds.log" 2>&1
echo "[runner] dense freivalds rc=$?" >> "$R/runner.log"
DF64RC_PACKED= DF64RC_DENSE=32768 DF64RC_BLOCKED=1 timeout 3600 python benchmarks/df64_record_cert.py > "$R/dense_cert_blocked.log" 2>&1
echo "[runner] dense blocked rc=$?" >> "$R/runner.log"

echo "[runner] bench.py (f64x tier promotion check)" >> "$R/runner.log"
timeout 3600 python bench.py > "$R/bench_r5_check.json" 2> "$R/bench_r5_check.log"
echo "[runner] bench rc=$?" >> "$R/runner.log"

echo "[runner] ring_mosaic_compile_r5 (df64 plane Mosaic + AOT)" >> "$R/runner.log"
timeout 3600 python benchmarks/ring_mosaic_compile_r5.py > "$R/ring_mosaic_df64.log" 2>&1
echo "[runner] mosaic rc=$?" >> "$R/runner.log"

echo "[runner] c64 3M A/B" >> "$R/runner.log"
timeout 5400 python benchmarks/c64_3m_ab.py > "$R/c64_3m_ab.log" 2>&1
echo "[runner] c64 rc=$?" >> "$R/runner.log"

echo "[runner] df64 serving probe" >> "$R/runner.log"
timeout 3600 python benchmarks/df64_serving_probe.py > "$R/df64_serving.log" 2>&1
echo "[runner] serving rc=$?" >> "$R/runner.log"

echo "[runner] df64 compile-wall bisect" >> "$R/runner.log"
timeout 7200 python benchmarks/df64_wall_bisect.py > "$R/df64_wall_bisect.log" 2>&1
echo "[runner] bisect rc=$?" >> "$R/runner.log"

echo "[runner] ALL DONE" >> "$R/runner.log"

echo "[runner] dense freivalds retry with streamed-transpose fix" >> "$R/runner.log"
DF64RC_PACKED= DF64RC_DENSE=32768 timeout 3600 python benchmarks/df64_record_cert.py > "$R/dense_cert_freivalds2.log" 2>&1
echo "[runner] dense freivalds2 rc=$?" >> "$R/runner.log"
echo "[runner] ALL DONE (incl. retry)" >> "$R/runner.log"

echo "[runner] df64 plane on-chip accuracy isolation" >> "$R/runner.log"
timeout 3600 python benchmarks/df64_plane_isolate.py > "$R/df64_plane_isolate.log" 2>&1
echo "[runner] isolate rc=$?" >> "$R/runner.log"

echo "[runner] df64 serving probe retry (matvec engine)" >> "$R/runner.log"
timeout 3600 python benchmarks/df64_serving_probe.py > "$R/df64_serving2.log" 2>&1
echo "[runner] serving2 rc=$?" >> "$R/runner.log"

echo "[runner] linalg accuracy matrix (default)" >> "$R/runner.log"
timeout 2400 python benchmarks/df64_linalg_matrix.py > "$R/df64_linalg_matrix_default.log" 2>&1
echo "[runner] matrix-default rc=$?" >> "$R/runner.log"
echo "[runner] linalg accuracy matrix (float32 global)" >> "$R/runner.log"
JAX_DEFAULT_MATMUL_PRECISION=float32 timeout 2400 python benchmarks/df64_linalg_matrix.py > "$R/df64_linalg_matrix_f32.log" 2>&1
echo "[runner] matrix-f32 rc=$?" >> "$R/runner.log"

echo "[runner] isolate v2 (C matrix: nb x shard_map)" >> "$R/runner.log"
timeout 3600 python benchmarks/df64_plane_isolate.py > "$R/df64_plane_isolate2.log" 2>&1
echo "[runner] isolate2 rc=$?" >> "$R/runner.log"

echo "[runner] isolate v3 (trailing slice-reuse probe D)" >> "$R/runner.log"
timeout 3600 python benchmarks/df64_plane_isolate.py > "$R/df64_plane_isolate3.log" 2>&1
echo "[runner] isolate3 rc=$?" >> "$R/runner.log"
