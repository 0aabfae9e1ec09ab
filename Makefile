.PHONY: install test test-fast bench entry dryrun lint

install:
	pip install -e . --no-deps --no-build-isolation

test:
	python -m pytest tests/ -q

# fast tier: everything except the slow-marked real-width parity, e2e
# CLI, scan-training and sharded-suite tests. ~10 min on an idle
# many-core box, up to ~25-30 min under load (measured round 3)
test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

entry:
	python __graft_entry__.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python __graft_entry__.py dryrun 8

lint:
	python -m compileall -q open_flamingo_tpu tests
