"""Smoke tests for the example config generators and the MC demo
(examples/DESI_*, lyacolore_mocks, Monte_carlo_sims, eBOSS_DR16)."""

import runpy
import pytest
import subprocess
import sys
from pathlib import Path

EXAMPLES = Path(__file__).resolve().parents[1] / 'examples'


def _run(script, *args):
    out = subprocess.run(
        [sys.executable, str(script), *args],
        capture_output=True, text=True, timeout=500)
    assert out.returncode == 0, out.stderr[-3000:]
    return out.stdout


def test_desi_data_setup_generates(tmp_path):
    out = _run(EXAMPLES / 'DESI_data_setup' / 'make_configs.py',
               '--correlations-dir', '/data/corr',
               '--weights-lya', '/data/w_lya', '--weights-lyb', '/data/w_lyb',
               '--qso-cat', '/data/qso', '--global-cov', '/data/gcov.fits',
               '--out-dir', str(tmp_path))
    main = tmp_path / 'main-baseline_combined.ini'
    assert main.exists(), out
    text = main.read_text()
    assert 'global-cov-file = /data/gcov.fits' in text
    assert 'qso_rad_strength = True' in text
    corr = (tmp_path / 'lyaxlya-baseline_combined.ini').read_text()
    assert 'new_metals = True' in corr
    assert 'desi-instrumental-systematics = True' in corr
    assert 'model-hcd = Rogers2018' in corr


def test_desi_mock_setup_generates(tmp_path):
    _run(EXAMPLES / 'DESI_mock_setup' / 'make_configs.py',
         '--correlations-dir', '/data/corr',
         '--weights-lya', '/data/w_lya', '--weights-lyb', '/data/w_lyb',
         '--qso-cat', '/data/qso', '--out-dir', str(tmp_path))
    corr = (tmp_path / 'lyaxlya-baseline_combined.ini').read_text()
    assert 'fullshape smoothing = gauss' in corr
    assert 'small scale nl' not in corr
    tracer_line = [ln for ln in corr.splitlines()
                   if ln.startswith('in tracer1')][0]
    assert 'CIV' not in tracer_line


def test_lyacolore_generates(tmp_path):
    _run(EXAMPLES / 'lyacolore_mocks' / 'make_configs.py',
         '--cf', '/data/cf_exp.fits', '--zeff', '2.3',
         '--out-dir', str(tmp_path))
    corr = (tmp_path / 'lyaxlya.ini').read_text()
    assert 'fullshape smoothing = gauss' in corr
    main = (tmp_path / 'main.ini').read_text()
    assert 'DR9LyaMocks' in main


@pytest.mark.slow
def test_mc_demo_runs(capsys):
    sys.argv = ['run_mc_demo.py']
    runpy.run_path(str(EXAMPLES / 'Monte_carlo_sims' / 'run_mc_demo.py'),
                   run_name='__main__')
    assert 'MC demo OK' in capsys.readouterr().out
