"""Native sampler validation on an analytic Gaussian.

Uniform prior on [-5, 5]^2, likelihood N(0, 1) per dimension:
log Z = log(1 / 10^2) = -4.60517 (the Gaussian mass inside the box is 1
to within 6e-7).
"""

import configparser

import numpy as np
import pytest

from vega_tpu.samplers.nested import NestedSampler
from vega_tpu.samplers.smc import SMCSampler

TRUE_LOGZ = -np.log(100.0)


def gaussian_loglik(params):
    x = np.asarray(params['x'])
    y = np.asarray(params['y'])
    return -0.5 * (x ** 2 + y ** 2) - np.log(2 * np.pi)


def make_config(tmp_path, **options):
    config = configparser.ConfigParser()
    config.optionxform = lambda option: option
    config['sampler'] = {'path': str(tmp_path), 'name': 'gauss'}
    for key, val in options.items():
        config['sampler'][key] = str(val)
    return config['sampler']


LIMITS = {'x': (-5.0, 5.0), 'y': (-5.0, 5.0)}


def test_nested_sampler_gaussian(tmp_path):
    sampler = NestedSampler(
        make_config(tmp_path, num_live=200, num_repeats=10, precision=0.01,
                    resume=False),
        LIMITS, gaussian_loglik)
    results = sampler.run()

    assert results['logz'] == pytest.approx(TRUE_LOGZ, abs=0.25)
    mean_x = np.average(results['samples'][:, 0], weights=results['weights'])
    var_x = np.average((results['samples'][:, 0] - mean_x) ** 2,
                       weights=results['weights'])
    assert mean_x == pytest.approx(0.0, abs=0.2)
    assert np.sqrt(var_x) == pytest.approx(1.0, abs=0.2)
    assert (tmp_path / 'gauss.txt').exists()
    assert (tmp_path / 'gauss.paramnames').exists()
    assert (tmp_path / 'gauss.stats').exists()


def test_nested_sampler_resume(tmp_path):
    config = make_config(tmp_path, num_live=100, num_repeats=6,
                         precision=0.01, max_iters=5, checkpoint_every=1)
    sampler = NestedSampler(config, LIMITS, gaussian_loglik)
    sampler.run()
    assert (tmp_path / 'gauss.resume.npz').exists()

    # Resume and finish
    config2 = make_config(tmp_path, num_live=100, num_repeats=6,
                          precision=0.01)
    sampler2 = NestedSampler(config2, LIMITS, gaussian_loglik)
    results = sampler2.run()
    assert results['logz'] == pytest.approx(TRUE_LOGZ, abs=0.35)


def test_smc_sampler_gaussian(tmp_path):
    sampler = SMCSampler(
        make_config(tmp_path, n_effective=600, n_mcmc=8),
        LIMITS, gaussian_loglik)
    results = sampler.run()

    assert results['logz'] == pytest.approx(TRUE_LOGZ, abs=0.25)
    mean_x = results['samples'][:, 0].mean()
    std_x = results['samples'][:, 0].std()
    assert mean_x == pytest.approx(0.0, abs=0.25)
    assert std_x == pytest.approx(1.0, abs=0.25)
