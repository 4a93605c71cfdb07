"""Batched chi^2 scan (all grid points minimized simultaneously)
against the serial re-minimizing scan."""

import numpy as np

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
    # equivalent at each point)
    vega.main_config['chi2 scan'] = {
        'bias_LYA': f'{grid[0]} {grid[-1]} {len(grid)}'}
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
