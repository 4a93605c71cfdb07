"""Golden-value parity tests for the power-spectrum model.

All target numbers are the reference's own regression checksums
(reference: tests/test_pk.py), evaluated on the same shipped PlanckDR16
template — they pin factor-by-factor numerical agreement of the jax
implementation with the original numpy/numba one.
"""

import configparser

import numpy as np
import pytest

from vega_tpu import utils
from vega_tpu.io.fits import read_fits
from vega_tpu.power_spectrum import PowerSpectrum


@pytest.fixture(scope='module')
def fiducial():
    template = utils.find_file('PlanckDR16/PlanckDR16.fits')
    hdul = read_fits(template)
    return {
        'z_eff': 2.25,
        'k': hdul[1]['K'],
        'pk_full': hdul[1]['PK'],
        'pk_smooth': hdul[1]['PKSB'],
        'z_fiducial': hdul[1].header['ZREF'],
    }


def make_config(**options):
    config = configparser.ConfigParser()
    config.optionxform = lambda option: option
    config['model'] = {'bin_size_rp': '4', 'bin_size_rt': '4'}
    for key, val in options.items():
        config['model'][key.replace('_', ' ') if ' ' in key else key] = val
    return config['model']


LYA = {'name': 'LYA', 'type': 'continuous'}
QSO = {'name': 'QSO', 'type': 'discrete'}


def test_bias_beta_resolution():
    params = {'bias_LYA': -0.12, 'beta_LYA': 1.6}
    b1, be1, b2, be2 = utils.bias_beta(params, 'LYA', 'LYA')
    assert (b1, be1) == (b2, be2) == (-0.12, 1.6)

    params = {'bias_eta_LYA': -0.2, 'beta_LYA': 1.6, 'growth_rate': 0.97}
    b1, be1, _, _ = utils.bias_beta(params, 'LYA', 'LYA')
    assert b1 == pytest.approx(-0.2 * 0.97 / 1.6)
    assert be1 == 1.6

    params = {'bias_eta_LYA': -0.2, 'bias_LYA': -0.12, 'growth_rate': 0.97}
    b1, be1, _, _ = utils.bias_beta(params, 'LYA', 'LYA')
    assert b1 == -0.12
    assert be1 == pytest.approx(-0.2 * 0.97 / -0.12)

    params = {'bias_LYA': -0.12, 'beta_LYA': 1.6,
              'bias_eta_QSO': 1, 'beta_QSO': 0.25, 'growth_rate': 0.97}
    _, _, b2, be2 = utils.bias_beta(params, 'LYA', 'QSO')
    assert b2 == pytest.approx(0.97 / 0.25)
    assert be2 == 0.25


def test_kaiser_and_plain_compute(fiducial):
    config = make_config(**{'model binning': 'False'})
    pk = PowerSpectrum(config, fiducial, LYA, LYA, 'lyaxlya')
    assert not pk.use_Gk
    params = {'bias_LYA': -0.12, 'beta_LYA': 1.6, 'peak': False}
    b1, be1, b2, be2 = utils.bias_beta(params, 'LYA', 'LYA')
    kaiser = np.asarray(pk.compute_kaiser(b1, be1, b2, be2))
    assert kaiser.shape == (1000, 1)
    assert np.sum(kaiser) == pytest.approx(37.13279)
    pk_model, bad = pk.compute(fiducial['pk_smooth'], params)
    assert np.asarray(pk_model).shape == (1000, 814)
    assert not bool(bad)
    np.testing.assert_allclose(
        np.asarray(pk_model), fiducial['pk_smooth'] * kaiser)


def test_gk_window(fiducial):
    config = make_config(**{'model binning': 'False'})
    pk = PowerSpectrum(config, fiducial, LYA, LYA, 'lyaxlya')
    gk = np.asarray(pk.compute_Gk(
        {'par binsize lyaxlya': 2, 'per binsize lyaxlya': 3}))
    assert np.sum(gk) == pytest.approx(470301.136422)
    gk = np.asarray(pk.compute_Gk({}))
    assert np.sum(gk) == pytest.approx(450783.949889)


def test_fast_metals_mode(fiducial):
    config = make_config()
    pk = PowerSpectrum(config, fiducial, LYA, LYA, 'lyaxlya')
    params = {'bias_LYA': -0.12, 'beta_LYA': 1.6, 'peak': False}
    pk_metals, _ = pk.compute(fiducial['pk_smooth'], params, fast_metals=True)
    assert np.mean(np.asarray(pk_metals)) == pytest.approx(1228.9847366)


def test_uv_heii_bias(fiducial):
    config = make_config(**{'UVB-fluctuations': 'True'})
    pk = PowerSpectrum(config, fiducial, LYA, LYA, 'lyaxlya')
    params = {'bias_gamma': 0.1125, 'bias_prim': -0.66, 'lambda_uv': 300}
    bias_uv, beta_uv = pk.compute_bias_beta_uv_heii(-0.12, 1.6, params)
    assert np.sum(np.asarray(bias_uv)) == pytest.approx(-35.268497)
    assert np.sum(np.asarray(beta_uv)) == pytest.approx(1138.77689)


def test_hcd_models(fiducial):
    params = {'bias_hcd': -0.05, 'beta_hcd': 0.5, 'L0_hcd': 10,
              'L0_sinc': 10}

    pk = PowerSpectrum(make_config(**{'model-hcd': 'Rogers'}),
                       fiducial, LYA, LYA, 'lyaxlya')
    bias_eff, beta_eff = pk.compute_bias_beta_hcd(-0.12, 1.6, params)
    assert np.sum(np.asarray(bias_eff)) == pytest.approx(-116031.686)
    assert np.sum(np.asarray(beta_eff)) == pytest.approx(1179867.64849)

    pk = PowerSpectrum(make_config(**{'model-hcd': 'fvoigt',
                                      'fvoigt_model': 'exp'}),
                       fiducial, LYA, LYA, 'lyaxlya')
    bias_eff, beta_eff = pk.compute_bias_beta_hcd(-0.12, 1.6, params)
    assert np.sum(np.asarray(bias_eff)) == pytest.approx(-121782.768388)
    assert np.sum(np.asarray(beta_eff)) == pytest.approx(1142662.6535)

    pk = PowerSpectrum(make_config(**{'model-hcd': 'sinc'}),
                       fiducial, LYA, LYA, 'lyaxlya')
    bias_eff, beta_eff = pk.compute_bias_beta_hcd(-0.12, 1.6, params)
    assert np.sum(np.asarray(bias_eff)) == pytest.approx(-118530.3944)
    assert np.sum(np.asarray(beta_eff)) == pytest.approx(1166657.39777)


def test_peak_nl(fiducial):
    pk = PowerSpectrum(make_config(), fiducial, LYA, LYA, 'lyaxlya')
    peak_nl = pk.compute_peak_nl({'sigmaNL_par': 6.36984, 'sigmaNL_per': 3.24})
    assert np.sum(np.asarray(peak_nl)) == pytest.approx(390698.51738)
    peak_nl = pk.compute_peak_nl({'sigmaNL_par': 6.36984, 'growth_rate': 0.97})
    assert np.sum(np.asarray(peak_nl)) == pytest.approx(390747.02382)
    peak_nl = pk.compute_peak_nl({'sigmaNL_per': 3.24, 'growth_rate': 0.97})
    assert np.sum(np.asarray(peak_nl)) == pytest.approx(390645.39796)


def test_dnl(fiducial):
    pk = PowerSpectrum(make_config(), fiducial, LYA, LYA, 'lyaxlya')
    params = {'dnl_arinyo_q1': 0.8558, 'dnl_arinyo_kv': 1.11454,
              'dnl_arinyo_av': 0.5378, 'dnl_arinyo_bv': 1.607,
              'dnl_arinyo_kp': 19.47}
    dnl, bad = pk.compute_dnl_arinyo(params)
    assert np.sum(np.asarray(dnl)) == pytest.approx(680327.61617)
    assert not bool(bad)
    dnl = pk.compute_dnl_mcdonald()
    assert np.sum(np.asarray(dnl)) == pytest.approx(632262.53194)


def test_fullshape_smoothing(fiducial):
    pk = PowerSpectrum(make_config(), fiducial, LYA, LYA, 'lyaxlya')
    fs = pk.compute_fullshape_gauss_smoothing(
        {'par_sigma_smooth': 2, 'per_sigma_smooth': 2.5})
    assert np.sum(np.asarray(fs)) == pytest.approx(404166.27948)
    fs = pk.compute_fullshape_exp_smoothing(
        {'par_sigma_smooth': 2, 'per_sigma_smooth': 2.5,
         'par_exp_smooth': 2, 'per_exp_smooth': 2.5})
    assert np.sum(np.asarray(fs)) == pytest.approx(333204.95791)


def test_velocity_dispersion(fiducial):
    pk = PowerSpectrum(make_config(), fiducial, LYA, QSO, 'lyaxqso')
    params = {'sigma_velo_disp_gauss_QSO': 6.8,
              'sigma_velo_disp_lorentz_QSO': 7.2}
    vd = pk.compute_velocity_dispersion_gauss(params)
    assert np.sum(np.asarray(vd)) == pytest.approx(435379.6457)
    vd = pk.compute_velocity_dispersion_lorentz(params)
    assert np.sum(np.asarray(vd)) == pytest.approx(446899.3964)


AUTO_PARAMS = {
    'bias_LYA': -0.12, 'beta_LYA': 1.6, 'bias_gamma': 0.1125,
    'bias_prim': -0.66, 'lambda_uv': 300, 'bias_hcd': -0.05,
    'beta_hcd': 0.5, 'L0_hcd': 10, 'sigmaNL_par': 6.36984,
    'sigmaNL_per': 3.24, 'par_sigma_smooth': 2, 'per_sigma_smooth': 2.5,
    'dnl_arinyo_q1': 0.8558, 'dnl_arinyo_kv': 1.11454,
    'dnl_arinyo_av': 0.5378, 'dnl_arinyo_bv': 1.607, 'dnl_arinyo_kp': 19.47,
}


def test_full_auto_pipeline(fiducial):
    config = make_config(**{
        'model-hcd': 'Rogers', 'UVB-fluctuations': 'True',
        'fvoigt_model': 'exp', 'small scale nl': 'arinyo',
        'fullshape smoothing': 'gauss'})
    pk = PowerSpectrum(config, fiducial, LYA, LYA, 'lyaxlya')

    params = dict(AUTO_PARAMS)
    params['peak'] = True
    pk_model, _ = pk.compute(fiducial['pk_full'] - fiducial['pk_smooth'], params)
    assert np.mean(np.asarray(pk_model)) == pytest.approx(2.8794436016)

    params['peak'] = False
    pk_model, _ = pk.compute(fiducial['pk_smooth'], params)
    assert np.mean(np.asarray(pk_model)) == pytest.approx(19.67878957)


def test_full_cross_pipeline(fiducial):
    config = make_config(**{
        'model-hcd': 'Rogers', 'UVB-fluctuations': 'True',
        'fvoigt_model': 'exp', 'fullshape smoothing': 'gauss',
        'velocity dispersion': 'lorentz'})
    pk = PowerSpectrum(config, fiducial, LYA, QSO, 'lyaxqso')

    params = {'bias_LYA': -0.12, 'beta_LYA': 1.6, 'bias_QSO': 3.7,
              'beta_QSO': 0.26, 'bias_gamma': 0.1125, 'bias_prim': -0.66,
              'lambda_uv': 300, 'bias_hcd': -0.05, 'beta_hcd': 0.5,
              'L0_hcd': 10, 'sigmaNL_par': 6.36984, 'sigmaNL_per': 3.24,
              'par_sigma_smooth': 2, 'per_sigma_smooth': 2.5,
              'sigma_velo_disp_lorentz_QSO': 7.2}
    params['peak'] = True
    pk_model, _ = pk.compute(fiducial['pk_full'] - fiducial['pk_smooth'], params)
    assert np.mean(np.asarray(pk_model)) == pytest.approx(-2.9406788865)

    params['peak'] = False
    pk_model, _ = pk.compute(fiducial['pk_smooth'], params)
    assert np.mean(np.asarray(pk_model)) == pytest.approx(-401.0937936)
