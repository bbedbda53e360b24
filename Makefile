# Dev tasks (the reference uses a justfile: check/format/build/test; same idea)
.PHONY: test test-fast demo bench native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not fuzz"

demo:
	python demo.py

bench:
	python bench.py

native:
	python -c "from strsim_tpu.native import native_available; assert native_available(); print('native lib ok')"

clean:
	rm -rf ~/.cache/tpu-strsim .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
bench-configs:
	python bench_configs.py
