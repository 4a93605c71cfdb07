"""Reference-named drop-in surface.

The reference exposes a handful of public entry points beyond the
main compute paths — the outdated Hamilton-2000 transform
(PktoXi.Pk2Mp / pk_to_xi, reference pktoxi.py:230-319), the cached
per-multipole interpolator split (compute_xi_ell / compute_xi,
pktoxi.py:166-228), the per-pair metal helpers (metals.py:144-256),
the ScaleParameters coordinate-map statics (scale_parameters.py:68-230)
and the growth machinery in utils (utils.py:128-227). vega_tpu carries
the same names as thin views over its own architecture; these tests pin
them against the main paths and, for Pk2Mp, against the LIVE reference
staticmethod (pure numpy/scipy, loaded standalone).
"""

import configparser
from pathlib import Path

import numpy as np
import pytest

REF = Path('/root/reference')


def _pktoxi(k, n_muk=60, **model):
    from vega_tpu.pktoxi import PktoXi
    config = configparser.ConfigParser()
    config.optionxform = lambda option: option
    config['model'] = {str(key): str(val) for key, val in model.items()}
    muk = (np.arange(n_muk) + 0.5) / n_muk
    return PktoXi(k, muk[:, None], 'LYA', 'LYA', config['model'])


K = np.logspace(-4, 2, 512)


def _smooth_pk(k, muk):
    kk = k[None, :] * np.ones_like(muk)
    return np.exp(-((np.log(kk) - np.log(0.08)) ** 2) / 2) \
        * (1 + 0.5 * muk ** 2)


@pytest.fixture(scope='module')
def ref_pk2mp():
    """The reference's Pk2Mp staticmethod, extracted without importing
    the vega package (its module needs mcfit/cachetools; the function
    itself is pure numpy/scipy)."""
    import ast
    import scipy.fft  # the reference module does `from numpy import fft`
    del scipy
    src = (REF / 'vega' / 'pktoxi.py').read_text()
    tree = ast.parse(src)
    fn = None
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == 'Pk2Mp':
            fn = node
            break
    assert fn is not None
    mod = ast.Module(body=[ast.fix_missing_locations(fn)], type_ignores=[])
    from numpy import fft
    from scipy import special, interpolate
    ns = {'np': np, 'fft': fft, 'special': special,
          'interpolate': interpolate}
    exec(compile(mod, '<ref Pk2Mp>', 'exec'), ns)
    return ns['Pk2Mp']


@pytest.mark.skipif(not REF.exists(), reason='reference not present')
def test_pk2mp_matches_live_reference(ref_pk2mp):
    from vega_tpu.pktoxi import PktoXi
    n_muk = 60
    muk = ((np.arange(n_muk) + 0.5) / n_muk)[:, None]
    dmuk = 1.0 / n_muk
    pk = _smooth_pk(K, muk)
    ar = np.linspace(10.0, 180.0, 50)

    for tform, spec in [(None, pk), ('rel', pk[0]), ('asy', pk[0])]:
        ells = (0, 2, 4, 6) if tform is None else \
            ((1, 3) if tform == 'rel' else (0, 2))
        theirs = ref_pk2mp(ar, K, spec, ells, muk, dmuk, tform=tform)
        ours = PktoXi.Pk2Mp(ar, K, spec, ells, muk, dmuk, tform=tform)
        # the only difference is our not-a-knot spline vs scipy splrep
        # at the knots; both interpolate the same xi samples
        scale = np.abs(theirs).max()
        np.testing.assert_allclose(ours, theirs, rtol=0,
                                   atol=2e-6 * scale)


def test_pk_to_xi_matches_old_fftlog_compute():
    """pk_to_xi IS the old_fftlog compute path (reference
    pktoxi.py:120-121 routes compute() there when old_fftlog is set)."""
    obj_legacy = _pktoxi(K, old_fftlog=True)
    obj = _pktoxi(K)
    muk = obj.muk_grid
    pk = _smooth_pk(K, muk)
    r = np.linspace(10.0, 180.0, 50)
    mu = np.linspace(0.0, 1.0, 50)

    via_compute, _ = obj_legacy.compute(r, mu, pk)
    via_dropin = obj.pk_to_xi(r, mu, pk)
    np.testing.assert_allclose(np.asarray(via_dropin),
                               np.asarray(via_compute), rtol=1e-10)

    # single multipole: no Legendre(mu) factor applied
    mono_c, _ = obj_legacy.compute(r, mu, pk, single_ell=0)
    mono_d = obj.pk_to_xi(r, mu, pk, multipole=0)
    np.testing.assert_allclose(np.asarray(mono_d), np.asarray(mono_c),
                               rtol=1e-10)


def test_compute_xi_ell_and_compute_xi_match_compute():
    obj = _pktoxi(K)
    pk = _smooth_pk(K, obj.muk_grid)
    r = np.linspace(10.0, 180.0, 60)
    mu = np.linspace(0.0, 1.0, 60)

    interp = obj.compute_xi_ell(pk, obj.ell_vals, 'cache', 'pars')
    assert set(interp) == set(obj.ell_vals)
    via_split = obj.compute_xi(interp, r, mu)
    direct, oob = obj.compute(r, mu, pk)
    assert not bool(oob)
    np.testing.assert_allclose(via_split, np.asarray(direct), rtol=0,
                               atol=1e-12 * np.abs(direct).max())

    # r = 0 rows are zeroed like the reference's masked evaluation
    r0 = np.concatenate([[0.0], r])
    mu0 = np.concatenate([[0.5], mu])
    assert obj.compute_xi(interp, r0, mu0)[0] == 0.0

    # out-of-range queries raise the reference's bounds error
    from vega_tpu.utils import VegaBoundsError
    with pytest.raises(VegaBoundsError):
        interp[0](np.log(1e30))


def _scale_params(**options):
    from vega_tpu.scale_parameters import ScaleParameters
    config = configparser.ConfigParser()
    config.optionxform = lambda option: option
    config['cosmo-fit type'] = {str(k): str(v) for k, v in options.items()}
    return ScaleParameters(config['cosmo-fit type'])


def test_scale_parameters_reference_named_methods():
    vals = {'ap': 1.04, 'at': 0.97, 'aiso': 1.02, 'epsilon': 0.01,
            'phi': 0.95, 'alpha': 1.03, 'peak': True}

    sp = _scale_params()
    assert sp.default() == (1.0, 1.0)
    assert sp.ap_at(vals) == (1.04, 0.97)
    np.testing.assert_allclose(
        sp.aiso_epsilon(vals), (1.02 * 1.01 ** 2, 1.02 / 1.01))
    np.testing.assert_allclose(
        sp.phi_alpha(vals), (1.03 / np.sqrt(0.95), 1.03 * np.sqrt(0.95)))

    # get_bao_params routes through the configured parametrisation and
    # agrees with the main get_ap_at entry for a peak component
    for name in ('ap_at', 'aiso_epsilon', 'phi_alpha'):
        sp = _scale_params(**{'cosmo fit func': name})
        np.testing.assert_allclose(sp.get_bao_params(vals),
                                   sp.get_ap_at(vals))

    # full-shape routing: ap_at full-shape names need full-shape-alpha
    sp = _scale_params(**{'full-shape': True, 'full-shape-alpha': True})
    full_vals = dict(vals, ap_full=1.1, at_full=0.9)
    assert sp.get_fullshape_params(full_vals) == (1.1, 0.9)
    np.testing.assert_allclose(sp.get_ap_at(full_vals), (1.1, 0.9))
    with pytest.raises(ValueError):
        _scale_params(**{'full-shape': True}).get_fullshape_params(vals)

    # phi_alpha full-shape naming (reference :133-160)
    sp = _scale_params(**{'full-shape': True,
                          'cosmo fit func': 'phi_alpha'})
    pa_vals = dict(vals, phi_full=0.9, alpha=1.05)
    got = sp.get_fullshape_phi_alpha(pa_vals)
    np.testing.assert_allclose(
        got, (1.05 / np.sqrt(0.9), 1.05 * np.sqrt(0.9)))
    np.testing.assert_allclose(sp.get_ap_at(pa_vals), got)


def test_utils_growth_reexports():
    from vega_tpu import utils, cosmo
    assert utils.growth_function is cosmo.growth_function
    assert utils.get_growth_interp is cosmo.get_growth_interp
    assert utils.hubble is cosmo.hubble
    assert utils.growth_integrand is cosmo.growth_integrand
    val = utils.growth_function(2.33, 0.31457, 1 - 0.31457)
    assert 0.2 < val < 0.4
