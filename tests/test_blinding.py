"""Blinding subsystem: data-level column selection and the hard stops
(reference: data.py:306-340, vega_interface.py:853-886)."""

import numpy as np
import pytest

from vega_tpu.io.fits import read_fits, write_fits
from vega_tpu.testing import make_synthetic_dataset
from vega_tpu.vega_interface import VegaInterface


def _set_blinding(data_file, strategy, blind_column=False):
    hdus = read_fits(data_file)
    cor = hdus[1]
    header = dict(cor.header)
    header = {k: v for k, v in header.items()
              if k in ('RPMIN', 'RPMAX', 'RTMAX', 'NP', 'NT')}
    header['BLINDING'] = strategy
    columns = dict(cor.columns)
    if blind_column:
        columns['DA_BLIND'] = columns['DA'] * 1.01  # offset blind vector
    write_fits(data_file, [
        {'name': 'COR', 'header': header, 'columns': columns},
        {'name': 'DMATTRI', 'columns': dict(hdus[2].columns)},
    ])


def test_passthrough_strategies(tmp_path):
    """desi_m2/y1/y3 use the plain DA column and do not set the blind
    flag (reference: data.py:334-336)."""
    main_path = make_synthetic_dataset(tmp_path, cross=False, size='tiny',
                                       noise=1.0)
    _set_blinding(tmp_path / 'cf_synthetic.fits', 'desi_y1')
    vega = VegaInterface(main_path)
    data = next(iter(vega.data.values()))
    assert data.blinding_strat == 'desi_y1'
    assert data.blind is False
    assert np.isfinite(vega.chi2())


def test_desi_dr3_requires_blind_column(tmp_path):
    main_path = make_synthetic_dataset(tmp_path, cross=False, size='tiny',
                                       noise=1.0)
    _set_blinding(tmp_path / 'cf_synthetic.fits', 'desi_dr3')
    with pytest.raises(AssertionError, match='do not run'):
        VegaInterface(main_path)


def test_desi_dr3_uses_blind_column(tmp_path):
    main_path = make_synthetic_dataset(tmp_path, cross=False, size='tiny',
                                       noise=1.0)
    data_file = tmp_path / 'cf_synthetic.fits'
    _set_blinding(data_file, 'desi_dr3', blind_column=True)
    vega = VegaInterface(main_path)
    data = next(iter(vega.data.values()))
    assert data.blind is True
    raw = read_fits(data_file)[1]
    np.testing.assert_allclose(data.data_vec, raw['DA_BLIND'])


def test_blind_fixed_parameter_rejected(tmp_path):
    """Sampling a BLIND_FIXED parameter on blind data must hard-stop
    (reference: vega_interface.py:869-872)."""
    main_path = make_synthetic_dataset(
        tmp_path, cross=False, size='tiny', noise=1.0,
        sample={'bias_LYA': 'True', 'ap_full': '0.5 1.5 1.0 0.1'})
    # ap_full needs to exist under [parameters]
    text = main_path.read_text().replace('[parameters]\n',
                                         '[parameters]\nap_full = 1.0\n')
    main_path.write_text(text)
    _set_blinding(tmp_path / 'cf_synthetic.fits', 'desi_dr3',
                  blind_column=True)
    with pytest.raises(ValueError, match='must be fixed'):
        VegaInterface(main_path)


def test_unknown_strategy_rejected(tmp_path):
    main_path = make_synthetic_dataset(tmp_path, cross=False, size='tiny',
                                       noise=1.0)
    _set_blinding(tmp_path / 'cf_synthetic.fits', 'desi_y9')
    with pytest.raises(ValueError, match='Unknown blinding'):
        VegaInterface(main_path)
