.PHONY: install test bench entry dryrun lint

install:
	pip install -e . --no-deps --no-build-isolation

test:
	python -m pytest tests/ -q

bench:
	python bench.py

entry:
	python __graft_entry__.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python __graft_entry__.py dryrun 8

lint:
	python -m compileall -q open_flamingo_tpu tests
