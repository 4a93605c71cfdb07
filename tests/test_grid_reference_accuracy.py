"""Grid-collapse vs dense-pipeline accuracy ON THE REFERENCE CONFIG at
the shipped production node settings (round-3 verdict follow-up: this
bound was previously measured only on the synthetic config and
extrapolated to the reference one).

The full measurement lives in benchmarks/grid_accuracy.py (20 points,
a range of truncation budgets; results in benchmarks/grid_accuracy*.json:
max |delta chi2| = 1.4e-10 at 64 nodes/dim, 1.7e-10 at the shipped
default 32, measured 2026-08-19). This CI version sweeps fewer points
and asserts the documented bound with ~4 orders of headroom — it fails
if the grid path's node convergence or mode truncation regresses
anywhere near mattering."""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path('/root/reference')

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REF.exists(),
                       reason='reference checkout not present'),
]


def test_grid_matches_dense_on_reference_config(monkeypatch, tmp_path):
    from vega_tpu.vega_interface import VegaInterface

    monkeypatch.chdir(REF / 'tests')
    config = 'full_configs/main.ini'

    # grid path at shipped production defaults (+/-0.25 pad, 32 nodes,
    # 2e-4 mode budget) — nothing overridden except turning it on
    monkeypatch.setenv('VEGA_TPU_GRID_COLLAPSE', '1')
    vega_grid = VegaInterface(config)

    rng = np.random.default_rng(7)
    pts = []
    for _ in range(6):
        pts.append({
            'ap': float(rng.uniform(0.83, 1.27)),
            'at': float(rng.uniform(0.73, 1.17)),
            'bias_eta_LYA': float(-0.2008 * (1 + 0.05 * rng.normal())),
            'beta_LYA': float(1.67 * (1 + 0.05 * rng.normal())),
        })
    chi2_grid = np.array([vega_grid.chi2(dict(p)) for p in pts])
    spec = vega_grid.get_collapsed(
        ('ap', 'at', 'bias_eta_LYA', 'beta_LYA'))['__grid__']
    assert spec.degrees == (32, 32), spec   # the shipped default

    monkeypatch.setenv('VEGA_TPU_GRID_COLLAPSE', '0')
    vega_dense = VegaInterface(config)
    chi2_dense = np.array([vega_dense.chi2(dict(p)) for p in pts])

    err = np.abs(chi2_grid - chi2_dense)
    # Two error sources, bounded separately: node convergence is
    # 1.7e-10 max over 20 points with truncation off
    # (benchmarks/grid_accuracy.py), and the shipped default 2e-4 mode
    # budget is VALIDATED against a probe cloud at build time — the
    # end-to-end default-settings error measured here is ~1.6e-5, well
    # inside the budget. Assert the budget: the validation layer itself
    # regressing is exactly what this test must catch.
    assert err.max() < 2e-4, (chi2_grid, chi2_dense)
