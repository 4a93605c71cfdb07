"""Gauss-Legendre mu_k quadrature mode (muk-quadrature =
gauss-legendre): ~64 nodes replace the reference's 1000-bin midpoint
rule at ~1/15 of the grid work. The mu integrands are smooth, so GL
converges spectrally; the midpoint ladder approaches the same limit
from O(1/N^2) away."""

import configparser
import tempfile

import numpy as np
import pytest


def _pk(quadrature, n_muk, template):
    from vega_tpu.power_spectrum import PowerSpectrum
    config = configparser.ConfigParser()
    config.optionxform = lambda option: option
    config['model'] = {
        'num_bins_muk': str(n_muk), 'muk-quadrature': quadrature,
        'bin_size_rp': '4', 'bin_size_rt': '4',
        'model-hcd': 'Rogers2018', 'z evol LYA': 'bias_vs_z_std',
    }
    t1 = {'name': 'LYA', 'type': 'continuous'}
    return PowerSpectrum(config['model'], template, t1, t1, 'lyaxlya')


@pytest.fixture(scope='module')
def template():
    from vega_tpu.models.eisenstein_hu import make_fiducial_template
    from vega_tpu.vega_interface import VegaInterface
    workdir = tempfile.mkdtemp(prefix='vega_tpu_muk_')
    path = f'{workdir}/fid.fits'
    make_fiducial_template(path, n_k=814)
    fid = VegaInterface._read_fiducial({'filename': path})
    fid['z_eff'] = 2.33
    return fid


PARAMS = {'bias_LYA': -0.117, 'beta_LYA': 1.67, 'bias_hcd': -0.05,
          'beta_hcd': 0.65, 'L0_hcd': 10., 'peak': False,
          'sigmaNL_par': 6.37, 'sigmaNL_per': 3.24, 'growth_rate': 0.97}


def test_gl64_matches_converged_multipoles(template):
    """P_ell projections: GL-64 coincides with GL-256 (spectral
    convergence — the truth), while the reference's midpoint-1000 rule
    carries its own O(1/N^2) discretization error ~2e-5; even
    midpoint-8000 is ~4e-7 away. GL-64 IS the converged integral at
    1/15 of the midpoint-1000 grid work."""
    from vega_tpu.pktoxi import PktoXi

    pk_lin = np.asarray(template['pk_smooth'])
    results = {}
    for label, quad, n in [('gl64', 'gauss-legendre', 64),
                           ('mid1000', 'midpoint', 1000),
                           ('converged', 'gauss-legendre', 256)]:
        pk_obj = _pk(quad, n, template)
        config = configparser.ConfigParser()
        config.optionxform = lambda option: option
        config['model'] = {}
        transform = PktoXi.init_from_Pk(pk_obj, config['model'])
        grid, _ = pk_obj.compute(pk_lin, dict(PARAMS))
        results[label] = np.asarray(transform.compute_pk_ells(grid))

    ref = results['converged']
    scale = np.max(np.abs(ref))
    err_gl = np.max(np.abs(results['gl64'] - ref)) / scale
    err_mid = np.max(np.abs(results['mid1000'] - ref)) / scale
    assert err_gl < 1e-8
    assert err_mid > 1e-5          # the midpoint rule's own error
    assert err_gl < err_mid / 100


def test_gl_weights_sum_to_one(template):
    pk_obj = _pk('gauss-legendre', 64, template)
    assert np.sum(pk_obj.muk_weights) == pytest.approx(1.0, rel=1e-14)
    # ell = 0 projection of a constant = the constant
    from vega_tpu.pktoxi import PktoXi
    config = configparser.ConfigParser()
    config.optionxform = lambda option: option
    config['model'] = {}
    transform = PktoXi.init_from_Pk(pk_obj, config['model'])
    const = np.ones((64, len(pk_obj.k_grid)))
    ells = np.asarray(transform.compute_pk_ells(const))
    assert ells[0] == pytest.approx(np.ones(len(pk_obj.k_grid)), rel=1e-13)
    # higher multipoles of an isotropic grid vanish
    assert np.max(np.abs(ells[1:])) < 1e-12


@pytest.mark.slow
def test_gl_end_to_end_chi2(template):
    """A full fit setup in GL mode runs and agrees with the midpoint
    default at the quadrature-discretization level."""
    from vega_tpu.testing import make_synthetic_dataset
    from vega_tpu.vega_interface import VegaInterface

    chi2 = {}
    for label, extra in [('mid', ''),
                         ('gl', 'muk-quadrature = gauss-legendre\n'
                                'num_bins_muk = 64\n')]:
        workdir = tempfile.mkdtemp(prefix=f'vega_tpu_muk_{label}_')
        vega = VegaInterface(make_synthetic_dataset(
            workdir, cross=False, extra_model=extra))
        chi2[label] = vega.chi2({'bias_LYA': -0.12, 'beta_LYA': 1.6})
    # both measure the same smooth function; the difference is the
    # midpoint rule's own O(1/N^2) discretization error
    assert chi2['gl'] == pytest.approx(chi2['mid'], rel=1e-3)
