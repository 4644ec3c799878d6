# Convenience targets for workoutdetector_tpu.

.PHONY: all native test test-fast bench train-bench repro lint clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q --ignore=tests/test_temporal_learning.py \
	    --ignore=tests/test_preemption.py

bench:
	python bench.py

train-bench:
	python tools/train_bench.py

# one-command protocol reproduction: corpus -> train -> sharded score
# sweep -> merged MAE/OBO table written into README.md (tools/repro.py)
repro: native
	python tools/repro.py --cpu

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
