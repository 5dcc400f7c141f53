# Convenience targets. The compute stack is JAX/XLA/Pallas (no native build
# needed); `make native` builds the C++ host runtime for the out-of-core path.

.PHONY: native test test-fast bench sweep-smoke clean

native:
	$(MAKE) -C dla_tpu/runtime/csrc

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

sweep-smoke: native
	python -m dla_tpu.bench.harness --profile benchmarks/sweep_cpu_smoke.json \
	    --csv results/bench_cpu.csv
	python -m dla_tpu.bench.plots results/bench_cpu.csv --out-dir results

clean:
	$(MAKE) -C dla_tpu/runtime/csrc clean
	rm -rf results .jax_cache
