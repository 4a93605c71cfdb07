# Developer entry points

PYTHON ?= python

.PHONY: test test-fast bench lint tutorial

test:
	$(PYTHON) -m pytest tests/ -x -q

test-fast:
	$(PYTHON) -m pytest tests/ -x -q -m "not slow"

bench:
	$(PYTHON) bench.py

tutorial:
	$(PYTHON) examples/synthetic_tutorial.py

lint:
	$(PYTHON) -m compileall -q vega_tpu tests bench.py __graft_entry__.py
