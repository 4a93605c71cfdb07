"""New-metals distortion matrices: native C++ path vs the numpy path
(reference algorithm, metals.py:502-752) must agree to roundoff."""

import configparser

import numpy as np
import pytest

import vega_tpu.native.pair_hist as ph
from vega_tpu.coordinates import Coordinates
from vega_tpu.cosmo import Cosmo
from vega_tpu.io.fits import write_fits
from vega_tpu.metals import Metals


class FakeCorrItem:
    pass


@pytest.fixture()
def metals_obj(tmp_path):
    # Stacked-delta weights file (LOGLAM/WEIGHT)
    rng = np.random.default_rng(3)
    wave = np.linspace(3600, 4800, 600)
    weights = rng.uniform(0.5, 2.0, 600)
    weights_path = tmp_path / 'delta_stack.fits'
    write_fits(weights_path, [{
        'name': 'STACK',
        'columns': {'LOGLAM': np.log10(wave), 'WEIGHT': weights}}])

    config = configparser.ConfigParser()
    config.optionxform = lambda o: o
    config['data'] = {'zmin': '0', 'zmax': '10'}
    config['model'] = {}
    config['metal-matrix'] = {
        'rebin_factor': '2', 'alpha_LYA': '2.9',
        'alpha_SiII(1190)': '1.', 'alpha_SiIII(1207)': '1.',
    }

    item = FakeCorrItem()
    item.config = config
    item.tracer1 = {'name': 'LYA', 'type': 'continuous',
                    'weights-path': str(weights_path)}
    item.tracer2 = {'name': 'LYA', 'type': 'continuous',
                    'weights-path': str(weights_path)}
    item.has_metals = False  # skip per-pair object construction
    item.new_metals = True
    item.name = 'lyaxlya'
    item.model_coordinates = Coordinates(0., 200., 200., 50, 50)
    item.cosmo = Cosmo(Om=0.315)
    item.metal_correlations = []

    fiducial = {'z_eff': 2.33, 'z_fiducial': 2.3, 'k': np.logspace(-4, 3, 32),
                'pk_full': np.ones(32), 'pk_smooth': np.ones(32)}

    metals = Metals.__new__(Metals)
    metals._corr_item = item
    metals.cosmo = item.cosmo
    metals._coordinates = item.model_coordinates
    metals.zmin = 0.0
    metals.zmax = 10.0
    metals.main_tracers = ['LYA', 'LYA']
    metals.main_tracer_types = ['continuous', 'continuous']
    metals.is_auto_correlation = True
    metals.metal_matrix_config = config['metal-matrix']
    metals.rp_nbins = 50
    metals.rt_nbins = 50
    del fiducial
    return metals


@pytest.mark.skipif(not ph.native_available(), reason='no C++ toolchain')
def test_new_metals_dmat_native_matches_numpy(metals_obj, monkeypatch):
    dmat_n, rp_n, rt_n, z_n = metals_obj.compute_metal_dmat(
        'SiIII(1207)', 'LYA')

    # Force the numpy fallback
    monkeypatch.setattr(ph, '_LIB', None)
    monkeypatch.setattr(ph, '_TRIED', True)
    dmat_p, rp_p, rt_p, z_p = metals_obj.compute_metal_dmat(
        'SiIII(1207)', 'LYA')

    np.testing.assert_allclose(dmat_n, dmat_p, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(rp_n, rp_p, rtol=1e-9)
    np.testing.assert_allclose(rt_n, rt_p, rtol=1e-12)
    np.testing.assert_allclose(z_n, z_p, rtol=1e-9)


@pytest.mark.skipif(not ph.native_available(), reason='no C++ toolchain')
def test_new_metals_rp_dmat_native_matches_numpy(metals_obj, monkeypatch):
    out_native = metals_obj.compute_metal_rp_dmat('SiII(1190)', 'LYA')

    monkeypatch.setattr(ph, '_LIB', None)
    monkeypatch.setattr(ph, '_TRIED', True)
    out_numpy = metals_obj.compute_metal_rp_dmat('SiII(1190)', 'LYA')

    for a, b in zip(out_native, out_numpy):
        np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-10)
