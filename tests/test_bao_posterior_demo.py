"""Smoke tests for the flagship BAO posterior demo
(examples/dr16_subset/bao_posterior.py): the config builders produce
valid sampler configurations, and a scaled-down end-to-end run of the
default synthetic injection recovers the truth."""

import configparser
import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
DEMO = REPO / 'examples' / 'dr16_subset' / 'bao_posterior.py'


@pytest.fixture(scope='module')
def demo():
    spec = importlib.util.spec_from_file_location('bao_posterior', DEMO)
    mod = importlib.util.module_from_spec(spec)
    sys.modules['bao_posterior'] = mod
    try:
        spec.loader.exec_module(mod)
        yield mod
    finally:
        del sys.modules['bao_posterior']


class _Args:
    dataset = 'synthetic'
    sampler = 'ns'
    num_live = 64
    precision = 0.5
    batch_size = None


def test_synthetic_config_builds(demo, tmp_path):
    main_path = demo.build_synthetic_config(tmp_path, _Args())
    config = configparser.ConfigParser()
    config.optionxform = lambda option: option
    config.read(main_path)
    assert config['control'].getboolean('run_sampler')
    assert config['Polychord']['num_live'] == '64'
    assert not config['Polychord'].getboolean('resume')
    assert config['sample']['ap'] == '0.9 1.1'
    assert 'HMC' in config


@pytest.mark.skipif(not Path('/root/reference/tests').exists(),
                    reason='reference checkout not present')
def test_dr16_config_builds(demo, tmp_path):
    main_path = demo.build_dr16_config(tmp_path, _Args())
    config = configparser.ConfigParser()
    config.optionxform = lambda option: option
    config.read(main_path)
    assert config['sample']['ap'] == '0.8 1.2'
    assert len(config['data sets']['ini files'].split()) == 4


@pytest.mark.slow
def test_demo_recovers_injection(demo, tmp_path, capsys):
    """Scaled-down end-to-end run of the default demo: the NS posterior
    must centre on the injected truth (ap = at = 1) within a few
    sigma."""
    results = demo.main(['--cpu', '--num-live', '64',
                         '--precision', '1e-1',
                         '--workdir', str(tmp_path)])
    out = capsys.readouterr().out
    assert 'logZ' in out
    w = results['weights']
    mean = np.average(results['samples'], weights=w, axis=0)
    std = np.sqrt(np.average((results['samples'] - mean) ** 2,
                             weights=w, axis=0))
    # sampled order: ap, at, bias_LYA, beta_LYA (the synthetic sample
    # dict order); truth is the dataset's generating parameters
    assert abs(mean[0] - 1.0) < 5 * std[0] + 1e-3
    assert abs(mean[1] - 1.0) < 5 * std[1] + 1e-3
    assert std[0] < 0.01 and std[1] < 0.01
