"""Monte-Carlo initialization modes, forecast, HDF5 output, low-mem."""

import numpy as np
import pytest

from vega_tpu.testing import make_synthetic_dataset
from vega_tpu.vega_interface import VegaInterface


def _with_mc_sections(main_path):
    text = main_path.read_text()
    text += ('\n[monte carlo]\nbias_LYA = True\nbeta_LYA = True\n'
             '\n[mc parameters]\nbias_LYA = -0.117\nbeta_LYA = 1.67\n')
    main_path.write_text(text)
    return main_path


def test_initialize_monte_carlo(tmp_path):
    """(reference: vega_interface.py:505-544)"""
    main_path = _with_mc_sections(make_synthetic_dataset(
        tmp_path, cross=False, size='tiny', noise=1.0,
        extra_control='run_montecarlo = True\nmc_seed = 7'))
    vega = VegaInterface(main_path)
    mocks = vega.initialize_monte_carlo()
    assert vega.monte_carlo
    name = next(iter(vega.corr_items))
    assert np.isfinite(mocks[name][vega.data[name].data_mask]).all()
    # chi2 now compares against the mock
    chi2 = vega.chi2()
    n = vega.data[name].data_size
    assert 0.2 * n < chi2 < 5 * n


def test_forecast_mode(tmp_path):
    """forecast = True: mock == fiducial, chi2(truth) == prior-only."""
    main_path = _with_mc_sections(make_synthetic_dataset(
        tmp_path, cross=False, size='tiny', noise=0.0,
        extra_control='run_montecarlo = True\nforecast = True'))
    vega = VegaInterface(main_path)
    vega.initialize_monte_carlo()
    chi2 = vega.chi2({'bias_LYA': -0.117, 'beta_LYA': 1.67})
    assert chi2 == pytest.approx(0.0, abs=1e-10)


def test_mc_run_and_seed_reproducibility(tmp_path):
    main_path = _with_mc_sections(make_synthetic_dataset(
        tmp_path, cross=False, size='tiny', noise=1.0,
        extra_control='run_montecarlo = True'))
    vega = VegaInterface(main_path)
    fiducial = vega.compute_model(run_init=False)
    vega.monte_carlo = True

    vega.analysis.run_monte_carlo(fiducial, num_mocks=2, seed=11,
                                  run_mc_fits=False)
    mocks_a = {k: np.array(v) for k, v in vega.analysis.mc_mocks.items()}
    vega.analysis.run_monte_carlo(fiducial, num_mocks=2, seed=11,
                                  run_mc_fits=False)
    for name in mocks_a:
        np.testing.assert_allclose(
            mocks_a[name], np.array(vega.analysis.mc_mocks[name]))


def test_hdf_output(tmp_path):
    import h5py

    vega = VegaInterface(make_synthetic_dataset(
        tmp_path, cross=False, size='tiny', noise=1.0))
    vega.minimize()
    vega.output.type = 'hdf'
    vega.output.outfile = str(tmp_path / 'results.h5')
    vega.output.write_results(vega.bestfit_model, vega.params,
                              vega.minimizer, vega.bestfit_corr_stats)
    with h5py.File(tmp_path / 'results.h5') as f:
        assert 'best fit' in f
        bf = f['best fit']
        for name, value in vega.minimizer.values.items():
            assert bf.attrs[name][0] == pytest.approx(value)


def test_low_mem_global_cov(tmp_path):
    vega = VegaInterface(make_synthetic_dataset(
        tmp_path, cross=True, size='tiny', noise=1.0, global_cov=True,
        extra_control='low_mem_mode = True'))
    assert vega.low_mem_mode
    assert vega.global_cov is None  # deleted after masking
    chi2 = vega.chi2()
    assert np.isfinite(chi2)


def test_mc_start_from_fit(tmp_path):
    """mc_start_from_fit: seed the MC template from a saved fit
    (reference: vega_interface.py:465-472)."""
    main_path = _with_mc_sections(make_synthetic_dataset(
        tmp_path, cross=False, size='tiny', noise=1.0,
        extra_control='run_montecarlo = True'))
    vega = VegaInterface(main_path)
    vega.minimize()
    vega.output.write_results(vega.bestfit_model, vega.params,
                              vega.minimizer, vega.bestfit_corr_stats)
    fit_file = vega.output.outfile + '.fits'

    vega2 = VegaInterface(main_path)
    vega2.main_config['control']['mc_start_from_fit'] = fit_file
    fiducial = vega2.get_fiducial_for_monte_carlo()
    name = next(iter(vega2.corr_items))
    assert np.isfinite(fiducial[name]).all()
    # template params = saved fit overridden by [mc parameters]
    # (reference: vega_interface.py:469-472)
    expected_params = dict(vega.minimizer.values)
    expected_params.update(vega2.mc_config['params'])
    expected = vega2.compute_model(expected_params, run_init=False)
    np.testing.assert_allclose(fiducial[name], expected[name], rtol=1e-10)
