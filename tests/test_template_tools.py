"""Template-generation machinery: inverse FFTLog, side-band split."""

import numpy as np
import pytest

from vega_tpu.io.fits import read_fits
from vega_tpu.models.eisenstein_hu import make_fiducial_template
from vega_tpu.ops.fftlog import (
    FFTLogP2Xi, FFTLogXi2P, extrapolated_transform)


def test_xi2p_roundtrip():
    k = np.logspace(-4, np.log10(1152.5), 814)
    pk = np.exp(-((np.log(k) - np.log(0.1)) ** 2))
    # pad_to=0 on both: the exact discrete-inverse property only holds
    # for the unpadded circular transforms (the padded default trades it
    # for physical accuracy; see tests/test_fftlog.py quadrature checks)
    fwd = FFTLogP2Xi(k, 0, pad_to=0)
    xi = fwd.transform(pk)
    inv = FFTLogXi2P(fwd.r_grid, 0, pad_to=0)
    np.testing.assert_allclose(inv.k_grid, k, rtol=1e-12)
    pk_back = inv.transform(xi)
    sel = (k > 1e-3) & (k < 100)
    np.testing.assert_allclose(pk_back[sel], pk[sel], rtol=1e-10,
                               atol=1e-12)


def test_extrapolated_transform_smooth_spectrum():
    k = np.logspace(-4, 3, 2000)
    pk = k ** 0.96 / (1 + (k / 0.1) ** 3.8)
    fwd = FFTLogP2Xi(k, 0)
    xi = fwd.transform(pk)
    k_out, pk_back = extrapolated_transform(FFTLogXi2P, fwd.r_grid, xi)
    sel = (k_out > 1e-2) & (k_out < 10)
    interp = np.interp(k_out[sel], k, pk)
    np.testing.assert_allclose(pk_back[sel], interp, rtol=1e-3)


def test_make_template_cli(tmp_path):
    from vega_tpu.scripts.make_template import main
    out = tmp_path / 'template.fits'
    assert main(['-o', str(out), '--z-ref', '2.3']) == 0
    hdu = read_fits(out)[1]
    assert hdu.header['ZREF'] == pytest.approx(2.3)
    k, pk, pksb = hdu['K'], hdu['PK'], hdu['PKSB']
    assert len(k) == 814
    assert np.all(np.isfinite(pk)) and np.all(np.isfinite(pksb))
    # side-band is smooth through the BAO region while PK wiggles
    sel = (k > 0.05) & (k < 0.3)
    ratio = pk[sel] / pksb[sel]
    assert ratio.max() > 1.01 and ratio.min() < 0.99


def test_eh98_template_loads_into_interface(tmp_path):
    path = tmp_path / 'fid.fits'
    make_fiducial_template(path)
    hdu = read_fits(path)[1]
    for key in ('ZREF', 'OM', 'OL', 'F_ZREF'):
        assert key in hdu.header
    assert 0.9 < hdu.header['F_ZREF'] < 1.0
