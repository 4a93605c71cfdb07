"""Smoke-run every tutorial script (examples/tutorials) — the example
surface must keep working as APIs evolve."""

import runpy
import sys
from pathlib import Path

import matplotlib
import pytest

pytestmark = pytest.mark.slow

TUTORIALS = sorted(
    (Path(__file__).resolve().parents[1] / 'examples' / 'tutorials').glob(
        '0*.py'))


@pytest.mark.parametrize('script', TUTORIALS, ids=lambda p: p.name)
def test_tutorial_runs(script, capsys):
    matplotlib.use('Agg')
    sys.argv = [str(script)]
    runpy.run_path(str(script), run_name='__main__')
    out = capsys.readouterr().out
    assert len(out) > 0
