"""Data-layer tests (counterpart of the reference's tests/test_data.py):
data vectors and coordinate grids round-trip from the FITS files."""

from pathlib import Path

import numpy as np
import pytest

from vega_tpu.correlation_item import CorrelationItem
from vega_tpu.data import Data
from vega_tpu.io.fits import read_fits
from vega_tpu.utils import find_file
from vega_tpu.vega_interface import parse_ini

REF = Path('/root/reference')


@pytest.mark.skipif(not REF.exists(), reason='reference checkout missing')
def test_data_roundtrip_reference_configs():
    main_config = parse_ini(REF / 'tests/configs/main.ini')
    ini_files = main_config['data sets'].get('ini files').split()

    for path in ini_files:
        config = parse_ini(find_file(path))
        corr_item = CorrelationItem(config)
        data = Data(corr_item)

        hdul = read_fits(find_file(config['data'].get('filename')))
        np.testing.assert_allclose(data.data_vec, hdul[1]['DA'])
        np.testing.assert_allclose(data.data_coordinates.rp_grid,
                                   hdul[1]['RP'])
        np.testing.assert_allclose(data.data_coordinates.rt_grid,
                                   hdul[1]['RT'])
        np.testing.assert_allclose(data.data_coordinates.z_grid,
                                   hdul[1]['Z'])
        # masks restrict to the analysis range
        r = data.data_coordinates.r_regular_grid[data.data_mask]
        assert r.min() > config['cuts'].getfloat('r-min', 10.)
        assert r.max() < config['cuts'].getfloat('r-max', 180.)


def test_synthetic_data_masks(tmp_path):
    from vega_tpu.testing import make_synthetic_dataset
    from vega_tpu.vega_interface import VegaInterface

    main_path = make_synthetic_dataset(tmp_path, cross=True, size='tiny')
    vega = VegaInterface(main_path)
    for name, data in vega.data.items():
        assert data.data_mask.sum() > 0
        assert data.masked_data_vec.shape == (data.data_mask.sum(),)
        assert data.inv_masked_cov.shape == (data.data_size, data.data_size)
        assert np.isfinite(data.log_cov_det)


def test_monte_carlo_mock(tmp_path):
    from vega_tpu.testing import make_synthetic_dataset
    from vega_tpu.vega_interface import VegaInterface

    main_path = make_synthetic_dataset(tmp_path, cross=False, size='tiny')
    vega = VegaInterface(main_path)
    data = next(iter(vega.data.values()))
    fiducial = np.asarray(
        vega.compute_model(run_init=False)[next(iter(vega.data))])
    mock = data.create_monte_carlo(fiducial, seed=42)
    assert mock.shape == (data.full_data_size,)
    assert np.isfinite(mock[data.data_mask]).all()
    # normalized residuals about the fiducial ~ N(0, 1)
    resid = mock[data.data_mask] - fiducial[data.data_mask]
    pulls = resid / np.sqrt(data.variance[data.data_mask])
    assert 0.7 < pulls.std() < 1.3


def test_invcov_content_cache():
    """The per-process factorization cache (utils.py) must return the
    SAME frozen array for identical (cov, mask) content, a fresh result
    for different content, and stay numerically exact."""
    from vega_tpu.utils import compute_log_cov_det, compute_masked_invcov

    rng = np.random.default_rng(7)
    a = rng.normal(size=(40, 40))
    cov = a @ a.T + 40 * np.eye(40)
    mask = np.ones(40, dtype=bool)
    mask[::5] = False

    inv1 = compute_masked_invcov(cov, mask)
    inv2 = compute_masked_invcov(cov.copy(), mask.copy())  # same content, new buffers
    assert inv1 is inv2                       # cache hit by content, not identity
    assert not inv1.flags.writeable           # shared across interfaces: frozen
    with pytest.raises(ValueError):
        inv1[0, 0] = 0.0
    np.testing.assert_allclose(
        inv1, np.linalg.inv(cov[np.ix_(mask, mask)]), rtol=1e-12)

    mask2 = mask.copy()
    mask2[1] = False
    inv3 = compute_masked_invcov(cov, mask2)  # different mask -> different entry
    assert inv3 is not inv1
    assert inv3.shape[0] == mask2.sum()

    d1 = compute_log_cov_det(cov, mask)
    d2 = compute_log_cov_det(cov.copy(), mask)
    assert d1 == d2
    assert np.isclose(d1, np.linalg.slogdet(cov[np.ix_(mask, mask)])[1])
