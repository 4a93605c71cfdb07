"""Global covariance path, small-scale marginalization and distortion."""

import numpy as np
import pytest

from vega_tpu.testing import make_synthetic_dataset
from vega_tpu.vega_interface import VegaInterface


def test_global_cov_matches_per_corr(tmp_path):
    """With a block-diagonal global covariance the joint chi^2 equals the
    sum of per-correlation chi^2 (reference: vega_interface.py:294-316)."""
    per_corr = VegaInterface(make_synthetic_dataset(
        tmp_path / 'a', cross=True, size='tiny', noise=1.0, seed=5))
    joint = VegaInterface(make_synthetic_dataset(
        tmp_path / 'b', cross=True, size='tiny', noise=1.0, seed=5,
        global_cov=True))

    assert joint._use_global_cov
    params = {'bias_LYA': -0.12, 'beta_LYA': 1.6}
    assert joint.chi2(params) == pytest.approx(per_corr.chi2(params),
                                               rel=1e-9)
    assert joint.log_lik(params) == pytest.approx(per_corr.log_lik(params),
                                                  rel=1e-9)


def test_global_monte_carlo(tmp_path):
    vega = VegaInterface(make_synthetic_dataset(
        tmp_path, cross=False, size='tiny', noise=1.0, global_cov=True,
        extra_control='run_montecarlo = True\nmc_seed = 3'))
    # add the monte carlo sections manually
    vega.mc_config = {'params': {}, 'sample': vega.sample_params}
    fiducial = vega.compute_model(run_init=False)
    mock = vega.analysis.create_global_monte_carlo(fiducial, seed=3)
    assert np.isfinite(mock).all()
    vega.monte_carlo = True
    chi2 = vega.chi2()
    assert np.isfinite(chi2)
    # mock chi2 should be of order the number of data points
    n = mock.size
    assert 0.3 * n < chi2 < 3 * n


def test_distortion_matrix_applied(tmp_path):
    plain = VegaInterface(make_synthetic_dataset(
        tmp_path / 'plain', cross=False, size='tiny', seed=2))
    distorted = VegaInterface(make_synthetic_dataset(
        tmp_path / 'dist', cross=False, size='tiny', seed=2,
        with_distortion=True))

    name = next(iter(plain.corr_items))
    m_plain = plain.compute_model(run_init=False)[name]
    m_dist = distorted.compute_model(run_init=False)[name]
    # The banded DM smooths the model: different from the plain one
    assert not np.allclose(m_plain, m_dist)
    dm = distorted.data[name].distortion_mat
    np.testing.assert_allclose(m_dist, dm @ m_plain, rtol=1e-10)


def test_small_scale_marginalization(tmp_path):
    marg_lines = ('marginalize-below-rtmax = 30\n'
                  'marginalize-prior-sigma = 10.0\n')
    vega = VegaInterface(make_synthetic_dataset(
        tmp_path, cross=False, size='tiny', noise=1.0,
        with_distortion=True, extra_model=marg_lines))
    name = next(iter(vega.corr_items))
    data = vega.data[name]
    assert data.num_marg_modes > 0
    assert data.marg_templates is not None
    assert data.marg_diff2coeff_matrix is not None
    assert data.effective_data_size == data.data_size - data.num_marg_modes

    chi2, coeffs = vega.chi2(return_marg_coeff=True)
    assert np.isfinite(chi2)
    assert name in coeffs
    assert np.isfinite(coeffs[name]).all()

    vega.minimize()
    assert np.isfinite(vega.minimizer.fmin.fval)


def test_marginalize_in_fit(tmp_path):
    marg_lines = ('marginalize-below-rtmax = 30\n'
                  'marginalize-prior-sigma = 10.0\n')
    control = 'marginalize-in-fit = True'
    vega = VegaInterface(make_synthetic_dataset(
        tmp_path, cross=False, size='tiny', noise=1.0,
        with_distortion=True, extra_model=marg_lines,
        extra_control=control))
    assert vega.marginalize_in_fit
    chi2 = vega.chi2()
    assert np.isfinite(chi2)


def test_model_pk_mode(tmp_path):
    vega = VegaInterface(make_synthetic_dataset(
        tmp_path, cross=False, size='tiny',
        extra_control='model_pk = True'))
    assert vega.model_pk
    model = vega.compute_model(run_init=False)
    name = next(iter(model))
    # multipoles (n_ell, n_k)
    assert model[name].shape == (4, 128)


def test_chi2_scan(tmp_path):
    vega = VegaInterface(make_synthetic_dataset(
        tmp_path, cross=False, size='tiny', noise=1.0))
    vega.main_config.add_section('chi2 scan')
    vega.main_config['chi2 scan']['bias_LYA'] = '-0.13 -0.10 3'
    results = vega.analysis.chi2_scan()
    assert len(results) == 3
    fvals = [r['fval'] for r in results]
    assert all(np.isfinite(fvals))
