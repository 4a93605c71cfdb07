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


@pytest.mark.slow
def test_nested_device_loop_matches_host_loop(tmp_path):
    """The fused on-device slice evolution (NestedSampler with a
    BatchedLikelihood: one jitted fori_loop dispatch per NS iteration,
    nested.py:_build_device_evolve) targets the same constrained
    distribution as the host-driven loop: same evidence and posterior
    moments within the NS statistical scatter. The two paths draw
    different random streams (jax.random vs numpy), so agreement is
    statistical, not bitwise."""
    from vega_tpu.parallel import BatchedLikelihood
    from vega_tpu.testing import make_synthetic_dataset
    from vega_tpu.vega_interface import VegaInterface

    main_path = make_synthetic_dataset(
        tmp_path, cross=False, size='tiny', noise=1.0)
    vega = VegaInterface(main_path)
    batched = BatchedLikelihood(vega)
    limits = {'bias_LYA': (-0.3, -0.01), 'beta_LYA': (0.5, 3.0)}

    results = {}
    for label, device_loop in (('device', True), ('host', False)):
        out = tmp_path / f'out_{label}'
        out.mkdir()
        config = configparser.ConfigParser()
        config.optionxform = lambda option: option
        config['s'] = {'path': str(out), 'name': f'ns_{label}',
                       'num_live': '100', 'num_repeats': '6',
                       'precision': '0.05', 'resume': 'False',
                       'seed': '7', 'device_loop': str(device_loop)}
        sampler = NestedSampler(config['s'], limits, batched)
        assert sampler._batched is batched
        assert sampler.device_loop is device_loop
        results[label] = sampler.run()

    for r in results.values():
        assert np.isfinite(r['logz'])
    assert results['device']['logz'] == pytest.approx(
        results['host']['logz'], abs=3.0 * max(
            results['device']['logz_err'], results['host']['logz_err'],
            0.1))
    for i in range(2):
        means = {}
        stds = {}
        for label, r in results.items():
            means[label] = np.average(r['samples'][:, i],
                                      weights=r['weights'])
            stds[label] = np.sqrt(np.average(
                (r['samples'][:, i] - means[label]) ** 2,
                weights=r['weights']))
        scale = max(stds.values())
        assert means['device'] == pytest.approx(means['host'],
                                                abs=3.0 * scale)
        assert stds['device'] == pytest.approx(stds['host'],
                                               rel=0.6)
