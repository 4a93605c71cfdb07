"""Self-containment: the framework must run real analyses with no
reference checkout mounted.

All standard data assets (fiducial Pk templates, Fvoigt HCD profiles,
DESI instrumental-systematics tables) ship in vega_tpu/models/
(see scripts/vendor_model_data.py); VEGA_TPU_NO_REFERENCE=1 makes
`utils.find_file` refuse the /root/reference fallback, simulating an
unmounted reference. Reference anchors: utils.py:230-268 (find_file),
vega_interface.py:666-703 (fiducial read), power_spectrum.py:59-68
(Fvoigt), correlation_func.py:553-595 (DESI systematics).
"""

import tempfile

import numpy as np
import pytest


@pytest.fixture()
def no_reference(monkeypatch):
    monkeypatch.setenv('VEGA_TPU_NO_REFERENCE', '1')


def test_find_file_refuses_reference(no_reference):
    from vega_tpu.utils import find_file
    # Packaged asset resolves locally
    path = find_file('PlanckDR16/PlanckDR16.fits')
    assert '/root/reference' not in str(path)
    # A reference-only fixture must NOT resolve
    with pytest.raises(RuntimeError):
        find_file('data/cf_lya-exp.fits.gz')


def test_vendored_fiducial_matches_reference():
    """The vendored template must be bit-identical to the upstream data."""
    import pathlib
    if not pathlib.Path('/root/reference').is_dir():
        pytest.skip('reference checkout not present')
    from vega_tpu.io.fits import read_fits
    ours = read_fits('vega_tpu/models/PlanckDR16/PlanckDR16.fits')
    theirs = read_fits('/root/reference/vega/models/PlanckDR16/PlanckDR16.fits')
    for col in ('K', 'PK', 'PKSB'):
        np.testing.assert_array_equal(ours[1][col], theirs[1][col])
    for key in ('ZREF', 'OM', 'OL'):
        assert ours[1].header[key] == theirs[1].header[key]


def test_full_fit_without_reference(no_reference):
    """End-to-end: build a synthetic dataset, swap its fiducial for the
    vendored PlanckDR16 template, enable Fvoigt HCD + DESI instrumental
    systematics (the three reference-data touchpoints), fit."""
    from vega_tpu.testing import make_synthetic_dataset
    from vega_tpu.vega_interface import VegaInterface

    workdir = tempfile.mkdtemp(prefix='vega_tpu_selfcont_')
    main_path = make_synthetic_dataset(workdir, cross=False, size='tiny')

    # Point the config at the vendored assets
    import configparser
    main = configparser.ConfigParser()
    main.optionxform = str
    main.read(main_path)
    main['fiducial']['filename'] = 'PlanckDR16/PlanckDR16.fits'
    with open(main_path, 'w') as f:
        main.write(f)

    corr_ini = main['data sets']['ini files'].split()[0]
    corr = configparser.ConfigParser()
    corr.optionxform = str
    corr.read(corr_ini)
    corr['model']['model-hcd'] = 'fvoigt'
    corr['model']['fvoigt_model'] = 'exp'
    corr['model']['desi-instrumental-systematics'] = 'True'
    with open(corr_ini, 'w') as f:
        corr.write(f)

    vega = VegaInterface(main_path)
    params = dict(vega.params)
    params.setdefault('bias_hcd', -0.05)
    params.setdefault('beta_hcd', 0.7)
    params.setdefault('desi_inst_sys_amp', 1e-4)
    vega.params = params
    chi2 = vega.chi2({'bias_LYA': -0.117, 'beta_LYA': 1.67})
    assert np.isfinite(float(chi2))
