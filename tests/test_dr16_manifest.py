"""The DR16 real-data manifest: the generated Table-6 configs must
point at the exact SVN file names the reference's own examples quote
(reference: examples/eBOSS_DR16/*.ini), and verify_dr16 must pass on a
correctly-shaped directory, pin checksums, and fail with actionable
messages on corruption or missing columns."""

import configparser
import io
import json
import runpy
import sys
from pathlib import Path

import numpy as np
import pytest

from vega_tpu.io.fits import read_fits, write_fits
from vega_tpu.scripts.verify_dr16 import (
    load_manifest, required_metal_pairs, verify, LOCAL_MANIFEST)
from vega_tpu.testing import _write_correlation_data


REPO = Path(__file__).resolve().parents[1]


def write_fake_metal_file(path, tracers, metals, n=16):
    """Minimal metal file with the HDU/column layout of a picca
    metal_dmat export: attributes header in HDU 1, per-pair RP_/RT_/Z_
    and DM_ columns in HDU 2."""
    rng = np.random.default_rng(0)
    header = {'RPMIN': 0., 'RPMAX': 200., 'RTMAX': 200.,
              'NP': 4, 'NT': 4, 'BLINDING': 'none'}
    columns = {}
    for pair in required_metal_pairs(tracers[0], tracers[1], metals):
        name = '_'.join(pair)
        columns[f'RP_{name}'] = np.linspace(2., 198., n)
        columns[f'RT_{name}'] = np.linspace(2., 198., n)
        columns[f'Z_{name}'] = np.full(n, 2.334)
        columns[f'DM_{name}'] = np.eye(n) + 0.01 * rng.normal(size=(n, n))
    write_fits(path, [
        {'name': 'ATTRI', 'header': header,
         'columns': {'DUMMY': np.zeros(1)}},
        {'name': 'MDMAT', 'columns': columns},
    ])


@pytest.fixture(scope='module')
def fake_svn_dir(tmp_path_factory):
    """A directory shaped like the SDSS SVN lya_forest download."""
    d = tmp_path_factory.mktemp('lya_forest')
    manifest = load_manifest()
    rng = np.random.default_rng(1)
    for fname, info in manifest['files'].items():
        if info['kind'] == 'correlation':
            _write_correlation_data(
                d / fname, is_cross=info['is_cross'], z_eff=2.334,
                rng=rng, nt=10, with_distortion=True)
        else:
            write_fake_metal_file(d / fname, info['tracers'],
                                  manifest['metals'])
    return d


def test_verify_passes_and_pins(fake_svn_dir):
    out = io.StringIO()
    ok, report = verify(fake_svn_dir, record=True, out=out)
    assert ok, out.getvalue()
    local = fake_svn_dir / LOCAL_MANIFEST
    assert local.exists()
    pinned = json.load(open(local))['sha256']
    assert set(pinned) == set(load_manifest()['files'])

    # second run validates against the pinned hashes
    out = io.StringIO()
    ok, _ = verify(fake_svn_dir, record=False, out=out)
    assert ok
    assert 'sha256 pinned' in out.getvalue()


def test_verify_catches_corruption(fake_svn_dir):
    # depends on test_verify_passes_and_pins having pinned the hashes
    target = fake_svn_dir / 'metal_xdmat_z_0_10.fits'
    blob = target.read_bytes()
    target.write_bytes(blob[:-2880] + b'\x00' * 2880)
    try:
        out = io.StringIO()
        ok, report = verify(fake_svn_dir, out=out)
        assert not ok
        assert any('SHA256 mismatch' in e for e in report['errors'])
    finally:
        target.write_bytes(blob)


def test_verify_catches_missing_file(fake_svn_dir, tmp_path):
    partial = tmp_path / 'partial'
    partial.mkdir()
    for f in fake_svn_dir.iterdir():
        if f.name not in ('xcf_z_0_10-exp.fits', LOCAL_MANIFEST):
            (partial / f.name).write_bytes(f.read_bytes())
    ok, report = verify(partial, out=io.StringIO())
    assert not ok
    assert any('xcf_z_0_10-exp.fits: MISSING' in e
               for e in report['errors'])


def test_verify_catches_missing_column(fake_svn_dir, tmp_path):
    """Dropping the DA column must name the file and the column."""
    broken = tmp_path / 'broken'
    broken.mkdir()
    for f in fake_svn_dir.iterdir():
        if f.name != LOCAL_MANIFEST:
            (broken / f.name).write_bytes(f.read_bytes())
    fname = 'cf_z_0_10-exp.fits'
    hdul = read_fits(broken / fname)
    cols = {k: hdul[1][k] for k in hdul[1].columns if k != 'DA'}
    header = {k: hdul[1].header[k]
              for k in ('RPMIN', 'RPMAX', 'RTMAX', 'NP', 'NT')}
    write_fits(broken / fname, [
        {'name': 'COR', 'header': header, 'columns': cols},
    ])
    ok, report = verify(broken, out=io.StringIO())
    assert not ok
    assert any(fname in e and 'DA' in e for e in report['errors'])


def test_generated_configs_match_svn_layout(fake_svn_dir, tmp_path):
    """make_configs must emit [data]/[metals] filenames that are exactly
    the manifest's SVN names, rooted in --data-dir."""
    out_dir = tmp_path / 'configs'
    argv = sys.argv
    sys.argv = ['make_configs.py', '--data-dir', str(fake_svn_dir),
                '--out-dir', str(out_dir)]
    try:
        runpy.run_path(
            str(REPO / 'examples/eBOSS_DR16/make_configs.py'),
            run_name='__main__')
    finally:
        sys.argv = argv

    manifest = load_manifest()
    expected = {
        (info['corr'], info['kind']): fname
        for fname, info in manifest['files'].items()
    }
    mains = sorted(out_dir.glob('main-*.ini'))
    assert len(mains) == 3
    checked = set()
    for main in mains:
        cfg = configparser.ConfigParser()
        cfg.optionxform = str
        cfg.read(main)
        for ini in cfg['data sets']['ini files'].split():
            ini_path = Path(ini) if Path(ini).is_absolute() \
                else out_dir / ini
            corr = configparser.ConfigParser()
            corr.optionxform = str
            corr.read(ini_path)
            name = corr['data']['name']
            data_file = Path(corr['data']['filename'])
            assert data_file.name == expected[(name, 'correlation')], \
                (name, data_file.name)
            assert data_file.parent == fake_svn_dir
            metal_file = Path(corr['metals']['filename'])
            assert metal_file.name == expected[(name, 'metal')], \
                (name, metal_file.name)
            checked.add(name)
    assert checked == {'lyaxlya', 'lyaxlyb', 'lyaxqso', 'lybxqso'}


def test_sisi_pairs_required_by_default():
    """The DR16 configs never set use_metal_autos, and the [model]
    default is True (data.py:38-39) — so the run READS SiII-SiII
    columns and the verifier must require them (a verifier that skips
    them would bless a file the fit then crashes on)."""
    metals = ['SiII(1190)', 'SiII(1193)', 'SiIII(1207)', 'SiII(1260)']
    pairs = required_metal_pairs('LYA', 'LYA', metals)
    assert ('SiII(1190)', 'SiII(1193)') in pairs
    # and the explicit opt-out still filters them
    pairs_off = required_metal_pairs('LYA', 'LYA', metals,
                                     use_metal_autos=False)
    assert ('SiII(1190)', 'SiII(1193)') not in pairs_off
    assert all('SiII' not in a or 'SiII' not in b for a, b in pairs_off)
