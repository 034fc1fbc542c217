# Convenience targets — analogue of the reference's Makefile
# (/root/reference/Makefile:26-117: build_all/test/bench/view/docs/...).

PY ?= python

.PHONY: all test test_fast bench native view docs site lint math clean install cloc

all: native

native:
	$(PY) -c "from icp_tpu.utils.native import build_native; assert build_native(verbose=True), 'native build failed'"

test:
	$(PY) -m pytest tests/ -q

test_fast:
	$(PY) -m pytest tests/ -q -x -m "not slow" -k "not ply"

bench:
	$(PY) bench.py

bench_suite:
	PYTHONPATH=. $(PY) -m icp_tpu.cli bench

view:
	PYTHONPATH=. $(PY) -m icp_tpu.cli view -S /root/reference/ex_data/scan1/first.csv \
		-D /root/reference/ex_data/scan1/second.csv -m trimmed --out view_frames

docs:
	$(PY) scripts/gen_docs.py

site: docs
	$(PY) scripts/gen_site.py

lint:
	$(PY) scripts/lint.py

math:
	$(PY) scripts/icp_math.py

install:
	$(PY) -m pip install -e .

clean:
	rm -rf build dist *.egg-info .pytest_cache .jax_cache view_frames
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true

cloc:
	@find icp_tpu native tests scripts -name '*.py' -o -name '*.cpp' | xargs wc -l | tail -1
