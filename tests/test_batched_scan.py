"""Batched chi^2 scan (all grid points minimized simultaneously)
against the serial re-minimizing scan."""

import numpy as np
import pytest

from vega_tpu.testing import make_synthetic_dataset
from vega_tpu.vega_interface import VegaInterface


def _setup(tmp_path):
    main_path = make_synthetic_dataset(str(tmp_path), cross=False,
                                       size='tiny')
    vega = VegaInterface(main_path)
    v0 = float(vega.sample_params['values']['bias_LYA'])
    grid = np.linspace(v0 * 1.02, v0 * 0.98, 4)  # bias_LYA is negative
    return vega, grid


def test_batched_scan_matches_serial(tmp_path):
    vega, grid = _setup(tmp_path)

    # serial reference: the Analysis scan loop (re-minimizing MIGRAD
    # equivalent at each point; batched is the default now, so opt out
    # explicitly)
    vega.main_config['chi2 scan'] = {
        'bias_LYA': f'{grid[0]} {grid[-1]} {len(grid)}'}
    vega.main_config['control']['batched_scan'] = 'False'
    serial = vega.analysis.chi2_scan()

    # batched: same grid through the control switch
    vega.main_config['control']['batched_scan'] = 'True'
    batched = vega.analysis.chi2_scan()

    assert len(batched) == len(serial) == len(grid)
    for row_b, row_s, fixed in zip(batched, serial, grid):
        assert row_b['bias_LYA'] == float(fixed)
        np.testing.assert_allclose(row_b['fval'], row_s['fval'],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(row_b['beta_LYA'], row_s['beta_LYA'],
                                   rtol=1e-3)


def test_batched_scan_respects_bounds(tmp_path):
    """A free parameter whose unconstrained profile optimum lies outside
    its sampling bounds must pin at the bound AND the remaining free
    parameters must still reach the constrained optimum. Plain clipping
    of the full Newton step stalls at a suboptimal interior fixed point
    ((H^-1 g)_free = 0 with g_free != 0); the projected active-set
    system is the fix — oracle: the serial bounds-aware L-BFGS-B scan."""
    vega, grid = _setup(tmp_path)
    beta0 = float(vega.sample_params['values']['beta_LYA'])
    # squeeze beta's upper bound below its optimum so the scan must pin
    vega.sample_params['limits']['beta_LYA'] = (0.5 * beta0, 0.9 * beta0)

    vega.main_config['chi2 scan'] = {
        'bias_LYA': f'{grid[0]} {grid[-1]} {len(grid)}'}
    vega.main_config['control']['batched_scan'] = 'False'
    serial = vega.analysis.chi2_scan()

    vega.main_config['control']['batched_scan'] = 'True'
    batched = vega.analysis.chi2_scan()

    for row_b, row_s in zip(batched, serial):
        assert row_b['beta_LYA'] == pytest.approx(0.9 * beta0, rel=1e-9)
        np.testing.assert_allclose(row_b['fval'], row_s['fval'],
                                   rtol=1e-5, atol=1e-6)


def test_batched_scan_2d(tmp_path):
    vega, grid = _setup(tmp_path)
    from vega_tpu.parallel import batched_chi2_scan

    beta0 = float(vega.sample_params['values']['beta_LYA'])
    grids = {'bias_LYA': grid[:2],
             'beta_LYA': np.array([beta0 * 0.99, beta0 * 1.01])}
    results = batched_chi2_scan(vega, grids, max_iterations=30)
    assert len(results) == 4
    # C order: first param is the outer loop
    assert results[0]['bias_LYA'] == results[1]['bias_LYA']
    assert results[0]['beta_LYA'] != results[1]['beta_LYA']
    # with both sampled params fixed the scan is pure evaluation
    for row in results:
        expected = float(vega.chi2({'bias_LYA': row['bias_LYA'],
                                    'beta_LYA': row['beta_LYA']}))
        np.testing.assert_allclose(row['fval'], expected, rtol=1e-10)


@pytest.mark.slow
def test_batched_scan_ap_at(tmp_path):
    """2D BAO (ap, at) profile scan through the batched path — the
    AP-sampled regime densifies the spline stage, exercising the dense
    fallback inside the batched Newton (BASELINE: (ap, at) agreement)."""
    from vega_tpu.parallel import batched_chi2_scan

    main_path = make_synthetic_dataset(
        str(tmp_path), cross=False, size='tiny',
        sample={'ap': 'True', 'at': 'True',
                'bias_LYA': 'True', 'beta_LYA': 'True'})
    vega = VegaInterface(main_path)

    grids = {'ap': np.array([0.98, 1.0, 1.02]),
             'at': np.array([0.97, 1.0, 1.03])}
    results = batched_chi2_scan(vega, grids, max_iterations=60)
    assert len(results) == 9
    fvals = {(row['ap'], row['at']): row['fval'] for row in results}
    assert all(np.isfinite(v) for v in fvals.values())
    # the data was generated at ap = at = 1: the grid point at the truth
    # must be the profile minimum
    truth = fvals[(1.0, 1.0)]
    assert truth == min(fvals.values())
    assert all(v > truth + 1.0 for k, v in fvals.items() if k != (1.0, 1.0))
