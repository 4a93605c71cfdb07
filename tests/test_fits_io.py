import numpy as np
import pytest
from pathlib import Path

from vega_tpu.io.fits import read_fits, write_fits

REF = Path('/root/reference')


def test_roundtrip(tmp_path):
    path = tmp_path / 'test.fits'
    rng = np.random.default_rng(42)
    da = rng.normal(size=100)
    co = rng.normal(size=(100, 100))
    names = np.array(['alpha', 'beta_x'])
    write_fits(path, [
        {'name': 'COR', 'header': {'RPMIN': 0.0, 'RPMAX': 200.0, 'NP': 50,
                                   'BLINDING': 'none', 'FLAG': True},
         'columns': {'DA': da, 'CO': co, 'NB': np.arange(100)}},
        {'name': 'META', 'columns': {'names': names,
                                     'ok': np.array([True, False])}},
        {'name': 'IMG', 'image': np.arange(12.0).reshape(3, 4)},
    ])
    hdus = read_fits(path)
    assert len(hdus) == 4  # primary + 3
    t = hdus[1]
    assert t.name == 'COR'
    assert t.header['RPMIN'] == 0.0
    assert t.header['NP'] == 50
    assert t.header['BLINDING'] == 'none'
    assert t.header['FLAG'] is True
    np.testing.assert_array_equal(t['DA'], da)
    np.testing.assert_array_equal(t['CO'], co)
    np.testing.assert_array_equal(t['NB'], np.arange(100))
    assert list(hdus[2]['names']) == ['alpha', 'beta_x']
    np.testing.assert_array_equal(hdus[2]['ok'], [True, False])
    np.testing.assert_array_equal(hdus[3].data, np.arange(12.0).reshape(3, 4))


@pytest.mark.skipif(not REF.exists(), reason='reference checkout not present')
def test_read_reference_fiducial():
    hdus = read_fits(REF / 'vega/models/PlanckDR16/PlanckDR16.fits')
    h = hdus[1]
    assert h.header['ZREF'] == pytest.approx(2.3)
    assert len(h['K']) == 814
    assert h['K'][0] == pytest.approx(1e-4)
    assert np.all(np.diff(np.log(h['K'])) > 0)


@pytest.mark.skipif(not REF.exists(), reason='reference checkout not present')
def test_read_reference_gzipped_correlation():
    hdus = read_fits(REF / 'tests/data/cf_lya-exp.fits.gz')
    h = hdus[1]
    assert h.header['NP'] == 50 and h.header['NT'] == 50
    assert h['DA'].shape == (2500,)
    assert h['RP'].shape == (2500,)
