# Top-level orchestration: native kernels, tests, benchmark.

.PHONY: all native test test-all test-fast bench clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

# full gate incl. the slow opt-in tier (production-scale fit accuracy,
# bf16 learning, whole-model gradient flow)
test-all: native
	RUN_SLOW=1 python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q \
	    --ignore=tests/test_monodetr_model.py \
	    --ignore=tests/test_train_step.py \
	    --ignore=tests/test_cli_integration.py

bench: native
	python bench.py

clean:
	$(MAKE) -C native clean
