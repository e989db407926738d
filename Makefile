# Top-level orchestration: native kernels, tests, benchmark.

.PHONY: all native test test-fast bench clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q \
	    --ignore=tests/test_monodetr_model.py \
	    --ignore=tests/test_train_step.py \
	    --ignore=tests/test_cli_integration.py

bench: native
	python bench.py

clean:
	$(MAKE) -C native clean
