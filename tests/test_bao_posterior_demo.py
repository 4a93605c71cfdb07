"""Smoke tests for the flagship BAO posterior demo
(examples/dr16_subset/bao_posterior.py): the config builders produce
valid sampler configurations, and a scaled-down end-to-end run of the
default synthetic injection recovers the truth."""

import configparser
import importlib.util
import os
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


@pytest.fixture(scope='module')
def f64_run(demo, tmp_path_factory):
    """One scaled-down f64 run of the default demo, shared by the
    injection-recovery and f32-cross-check tests."""
    workdir = tmp_path_factory.mktemp('bao_demo_f64')
    results = demo.main(['--cpu', '--num-live', '64',
                         '--precision', '1e-1',
                         '--workdir', str(workdir)])
    w = results['weights']
    mean = np.average(results['samples'], weights=w, axis=0)
    std = np.sqrt(np.average((results['samples'] - mean) ** 2,
                             weights=w, axis=0))
    return results, mean, std


@pytest.mark.slow
def test_demo_recovers_injection(f64_run):
    """Scaled-down end-to-end run of the default demo: the NS posterior
    must centre on the injected truth (ap = at = 1) within a few
    sigma."""
    results, mean, std = f64_run
    assert np.isfinite(results['logz'])
    # sampled order: ap, at, bias_LYA, beta_LYA (the synthetic sample
    # dict order); truth is the dataset's generating parameters
    assert abs(mean[0] - 1.0) < 5 * std[0] + 1e-3
    assert abs(mean[1] - 1.0) < 5 * std[1] + 1e-3
    assert std[0] < 0.01 and std[1] < 0.01


@pytest.mark.slow
def test_f32_ns_reproduces_f64_posterior(f64_run, tmp_path):
    """The f32 throughput mode reproduces the f64 BAO posterior through
    the grid-collapse path (docs/performance.md "Accuracy ladder"): the
    same scaled-down NS run at VEGA_TPU_X64=0 (fresh subprocess — the
    x64 switch is process-global) must land the same posterior moments.
    The two runs draw different realizations (f32 vs f64 jax.random
    streams), so agreement is asserted at the NS realization-scatter
    scale, not bitwise: |Δmean| within a posterior sigma, widths within
    40%. With Δχ² noise of the f32 grid path measured ≪ 1
    (tests/test_f32_mode.py::test_f32_grid_collapse_chi2_noise), any
    bias beyond realization scatter would be a precision artifact."""
    import re
    import subprocess
    import sys

    _, mean64, std64 = f64_run
    env = dict(os.environ)
    env['VEGA_TPU_X64'] = '0'
    env['PYTHONPATH'] = str(REPO) + os.pathsep + env.get('PYTHONPATH', '')
    result = subprocess.run(
        [sys.executable, str(DEMO), '--cpu', '--num-live', '64',
         '--precision', '1e-1', '--workdir', str(tmp_path)],
        capture_output=True, text=True, env=env, timeout=1800)
    assert result.returncode == 0, result.stderr[-3000:]
    moments = {m[0]: (m[1], m[2]) for m in re.findall(
        r'^\s*(\w+) = ([+-][\d.]+) \+/- ([\d.]+)$', result.stdout, re.M)}
    assert {'ap', 'at'} <= set(moments), result.stdout[-2000:]
    for i, name in enumerate(['ap', 'at']):
        mean32, std32 = (float(x) for x in moments[name])
        assert abs(mean32 - mean64[i]) < std64[i] + 1e-3, \
            f'{name}: f32 mean {mean32} vs f64 {mean64[i]} ± {std64[i]}'
        assert 0.6 < std32 / std64[i] < 1.67, \
            f'{name}: f32 width {std32} vs f64 {std64[i]}'
