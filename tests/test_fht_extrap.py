"""fht_extrap: mcfit's extrap=True input treatment (reference:
pktoxi.py:41-43) — power-law continuation of P_ell into the FFT padding
region instead of zero padding."""

import configparser
import tempfile

import numpy as np
import pytest


def _pktoxi(k, **model):
    from vega_tpu.pktoxi import PktoXi
    config = configparser.ConfigParser()
    config.optionxform = lambda option: option
    config['model'] = {str(key): str(val) for key, val in model.items()}
    muk = (np.arange(100) + 0.5) / 100
    return PktoXi(k, muk[:, None], 'LYA', 'LYA', config['model'])


K = np.logspace(-4, 2, 512)


def test_extrap_pad_continues_power_law_exactly():
    obj = _pktoxi(K, fht_extrap=True)
    pad_l, pad_r, delta = obj._extrap_geom
    pk = K ** -1.3
    padded = np.asarray(obj._extrap_pad(pk[None, :]))[0]
    n_fft = pad_l + len(K) + pad_r
    k_full = np.concatenate([
        K[0] * np.exp(-delta * np.arange(pad_l, 0, -1)), K,
        K[-1] * np.exp(delta * np.arange(1, pad_r + 1))])
    assert padded.shape == (n_fft,)
    assert padded == pytest.approx(k_full ** -1.3, rel=1e-10)


def test_extrap_pad_zero_fallback():
    obj = _pktoxi(K, fht_extrap=True)
    pad_l, pad_r, _ = obj._extrap_geom
    pk = np.ones_like(K)
    pk[0] = 0.0          # zero edge -> left block zero-padded
    pk[-1] = -pk[-2]     # sign flip -> right block zero-padded
    padded = np.asarray(obj._extrap_pad(pk[None, :]))[0]
    assert np.all(padded[:pad_l] == 0)
    assert np.all(padded[-pad_r:] == 0)


def test_extrap_transform_close_to_padded_on_smooth_pk():
    """For a smooth decaying spectrum the extrapolated and zero-padded
    transforms agree on interior scales (both converge to the true
    Hankel transform; extrap removes the edge-truncation ringing)."""
    pk = K / (1 + (K / 0.1) ** 3)   # ~k at low k, ~k^-2 at high k
    obj_pad = _pktoxi(K)
    obj_ext = _pktoxi(K, fht_extrap=True)
    r = np.logspace(0.5, 2.2, 200)
    mu = np.full_like(r, 0.5)
    pk2d = np.broadcast_to(pk, (100, len(K)))
    xi_pad, bad1 = obj_pad.compute(r, mu, np.asarray(pk2d))
    xi_ext, bad2 = obj_ext.compute(r, mu, np.asarray(pk2d))
    assert not bool(bad1) and not bool(bad2)
    scale = np.max(np.abs(np.asarray(xi_pad)))
    assert np.asarray(xi_ext) == pytest.approx(np.asarray(xi_pad),
                                               abs=2e-3 * scale)


def test_extrap_end_to_end_chi2():
    """A full VegaInterface fit setup with fht_extrap = True (with
    metals, exercising the unrolled metal fallback) runs and produces a
    finite, truth-consistent chi^2."""
    from vega_tpu.testing import make_synthetic_dataset
    from vega_tpu.vega_interface import VegaInterface

    workdir = tempfile.mkdtemp(prefix='vega_tpu_extrap_')
    main_path = make_synthetic_dataset(workdir, cross=False, size='tiny',
                                       extra_model='fht_extrap = True\n')
    vega = VegaInterface(main_path)
    chi2 = vega.chi2({'bias_LYA': -0.117, 'beta_LYA': 1.67})
    assert np.isfinite(chi2)
    # data was regenerated from the same extrap model -> chi2 ~ 0
    assert chi2 < 1e-6
