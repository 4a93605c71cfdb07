# Developer entry points

PYTHON ?= python

.PHONY: test test-fast test-slow bench lint tutorial

test:
	$(PYTHON) -m pytest tests/ -x -q

test-fast:
	$(PYTHON) -m pytest tests/ -x -q -m "not slow"

test-slow:
	$(PYTHON) -m pytest tests/ -x -q -m "slow" --durations=25

bench:
	$(PYTHON) bench.py

tutorial:
	$(PYTHON) examples/synthetic_tutorial.py

lint:
	$(PYTHON) -m compileall -q vega_tpu tests bench.py __graft_entry__.py
