"""External sampler adapter coverage via injected stub modules.

The image has neither pypolychord nor pocomc, so the external branches of
samplers/polychord.py and samplers/pocomc.py (settings mapping, prior
wrapper, derived-parameter wiring, chain writing) would otherwise never
execute. These tests inject minimal fake modules through sys.modules and
drive the adapters end to end, asserting the exact call surface the real
packages would see. Reference anchors: vega/samplers/polychord.py:27-127,
vega/samplers/pocomc.py:27-81. Same pattern for the optional iminuit
(MIGRAD) minimizer backend (reference: vega/minimizer.py:39-103).
"""

import configparser
import importlib
import sys
import types

import numpy as np
import pytest


def _sampler_config(tmp_path, extra=None):
    config = configparser.ConfigParser()
    config.optionxform = lambda o: o
    section = {'path': str(tmp_path), 'name': 'stubrun'}
    if extra:
        section.update(extra)
    config['s'] = section
    return config['s']


def _log_lik(params, return_marg_coeff=False):
    arr = {k: np.asarray(v) for k, v in params.items()}
    val = -0.5 * sum(((v - 0.5) / 0.1) ** 2 for v in arr.values())
    if return_marg_coeff:
        return float(val), np.array([0.25])
    return val


# ---------------------------------------------------------------------------
# PolyChord adapter
# ---------------------------------------------------------------------------
@pytest.fixture()
def stub_polychord(monkeypatch):
    calls = {}

    settings_mod = types.ModuleType('pypolychord.settings')

    class PolyChordSettings:
        def __init__(self, nDims, nDerived, **kwargs):
            self.nDims = nDims
            self.nDerived = nDerived
            for key, val in kwargs.items():
                setattr(self, key, val)
            calls['settings'] = self

    settings_mod.PolyChordSettings = PolyChordSettings

    priors_mod = types.ModuleType('pypolychord.priors')

    class UniformPrior:
        def __init__(self, lo, hi):
            self.lo, self.hi = lo, hi

        def __call__(self, x):
            return self.lo + x * (self.hi - self.lo)

    priors_mod.UniformPrior = UniformPrior

    pc_mod = types.ModuleType('pypolychord')

    def run_polychord(log_lik, n_dims, n_derived, settings, prior, dumper):
        calls['run'] = dict(n_dims=n_dims, n_derived=n_derived,
                            settings=settings)
        # exercise the wrappers exactly as PolyChord would
        theta = prior([0.5] * n_dims)
        calls['prior_point'] = theta
        val, derived = log_lik(theta)
        calls['log_lik_val'] = val
        calls['derived'] = derived
        dumper(None, None, None, 0.0, 0.0)

    pc_mod.run_polychord = run_polychord
    pc_mod.settings = settings_mod
    pc_mod.priors = priors_mod

    monkeypatch.setitem(sys.modules, 'pypolychord', pc_mod)
    monkeypatch.setitem(sys.modules, 'pypolychord.settings', settings_mod)
    monkeypatch.setitem(sys.modules, 'pypolychord.priors', priors_mod)

    import vega_tpu.samplers.polychord as adapter
    importlib.reload(adapter)
    yield adapter, calls
    monkeypatch.delitem(sys.modules, 'pypolychord')
    monkeypatch.delitem(sys.modules, 'pypolychord.settings')
    monkeypatch.delitem(sys.modules, 'pypolychord.priors')
    importlib.reload(adapter)


def test_polychord_adapter(tmp_path, stub_polychord):
    adapter, calls = stub_polychord
    assert adapter.HAS_POLYCHORD

    config = _sampler_config(tmp_path, {
        'num_live': '40', 'num_repeats': '7', 'precision': '0.01',
        'resume': 'False', 'do_clustering': 'True', 'seed': '3'})
    limits = {'ap': (0.4, 1.6), 'at': (0.2, 1.8)}
    sampler = adapter.Polychord(config, limits, _log_lik,
                                derived_dict={'lyaxlya': 1})
    assert isinstance(sampler, adapter.Polychord)

    # settings mapping (reference: samplers/polychord.py:27-92)
    s = calls['settings']
    assert (s.nDims, s.nDerived) == (2, 1)
    assert s.nlive == 40 and s.num_repeats == 7
    assert s.precision_criterion == 0.01
    assert s.write_resume is False and s.read_resume is False
    assert s.do_clustering is True and s.seed == 3
    assert s.base_dir == str(tmp_path) and s.file_root == 'stubrun'

    sampler.run()
    assert calls['run']['n_dims'] == 2
    # prior wrapper maps the mid-cube to the mid-limits
    np.testing.assert_allclose(calls['prior_point'], [1.0, 1.0])
    # log_lik wrapper returns (value, marg coefficients as derived)
    np.testing.assert_allclose(calls['derived'], [0.25])
    assert np.isfinite(calls['log_lik_val'])
    # paramnames written by the Sampler base
    assert (tmp_path / 'stubrun.paramnames').exists()


def test_polychord_fallback_without_stub(tmp_path):
    """Without pypolychord the adapter must hand over to the native NS."""
    import vega_tpu.samplers.polychord as adapter
    from vega_tpu.samplers.nested import NestedSampler
    if adapter.HAS_POLYCHORD:        # pragma: no cover
        pytest.skip('real pypolychord installed')
    config = _sampler_config(tmp_path, {'num_live': '10'})
    sampler = adapter.Polychord(config, {'ap': (0.4, 1.6)}, _log_lik)
    assert isinstance(sampler, NestedSampler)


# ---------------------------------------------------------------------------
# PocoMC adapter
# ---------------------------------------------------------------------------
@pytest.fixture()
def stub_pocomc(monkeypatch):
    calls = {}
    poco_mod = types.ModuleType('pocomc')

    class Prior:
        def __init__(self, dists):
            self.dists = list(dists)
            calls['prior'] = self

    class Sampler:
        def __init__(self, prior, likelihood, vectorize, precondition,
                     dynamic, n_effective, n_active, output_dir):
            calls['init'] = dict(
                prior=prior, vectorize=vectorize, precondition=precondition,
                dynamic=dynamic, n_effective=n_effective, n_active=n_active,
                output_dir=output_dir)
            self._likelihood = likelihood

        def run(self, n_total, n_evidence, save_every):
            calls['run'] = dict(n_total=n_total, n_evidence=n_evidence,
                                save_every=save_every)
            theta = np.array([[0.5, 0.5], [0.6, 0.4]])
            calls['vec_log_lik'] = self._likelihood(theta)

        def posterior(self):
            n = 4
            return (np.tile([0.5, 0.5], (n, 1)), np.ones(n),
                    np.zeros(n), np.zeros(n))

        def evidence(self):
            return -1.0, 0.1

    poco_mod.Prior = Prior
    poco_mod.Sampler = Sampler
    monkeypatch.setitem(sys.modules, 'pocomc', poco_mod)

    import vega_tpu.samplers.pocomc as adapter
    importlib.reload(adapter)
    yield adapter, calls
    monkeypatch.delitem(sys.modules, 'pocomc')
    importlib.reload(adapter)


def test_pocomc_adapter(tmp_path, stub_pocomc):
    adapter, calls = stub_pocomc
    assert adapter.HAS_POCOMC

    config = _sampler_config(tmp_path, {
        'n_effective': '64', 'n_active': '32', 'n_total': '128',
        'save_every': '5', 'dynamic': 'True'})
    limits = {'ap': (0.4, 1.6), 'at': (0.2, 1.8)}
    sampler = adapter.PocoMC(config, limits, _log_lik)
    assert isinstance(sampler, adapter.PocoMC)

    # prior mapping: scipy uniform(loc, scale) per parameter
    # (reference: samplers/pocomc.py:27-55)
    dists = calls['prior'].dists
    assert len(dists) == 2
    assert dists[0].kwds.get('loc', dists[0].args[0]) == pytest.approx(0.4)

    sampler.run()
    assert calls['init']['vectorize'] is True
    assert calls['init']['n_effective'] == 64
    assert calls['init']['dynamic'] is True
    assert calls['run'] == dict(n_total=128, n_evidence=0, save_every=5)
    # vectorized likelihood wrapper: (n_batch,) finite values
    assert np.all(np.isfinite(calls['vec_log_lik']))
    assert np.shape(calls['vec_log_lik']) == (2,)
    # chain + stats written (reference: samplers/pocomc.py:57-81)
    assert (tmp_path / 'stubrun.txt').exists()
    assert (tmp_path / 'stubrun.stats').exists()
    chain = np.loadtxt(tmp_path / 'stubrun.txt')
    assert chain.shape == (4, 4)


def test_pocomc_fallback_without_stub(tmp_path):
    import vega_tpu.samplers.pocomc as adapter
    from vega_tpu.samplers.smc import SMCSampler
    if adapter.HAS_POCOMC:           # pragma: no cover
        pytest.skip('real pocomc installed')
    config = _sampler_config(tmp_path, {'n_effective': '16'})
    sampler = adapter.PocoMC(config, {'ap': (0.4, 1.6)}, _log_lik)
    assert isinstance(sampler, SMCSampler)


# ---------------------------------------------------------------------------
# iminuit (MIGRAD) minimizer backend
# ---------------------------------------------------------------------------
@pytest.fixture()
def stub_iminuit(monkeypatch):
    calls = {}
    mod = types.ModuleType('iminuit')

    class _Access:
        """name-or-index keyed view like iminuit's ValueView."""

        def __init__(self, names, values):
            self._names = list(names)
            self._store = dict(zip(names, values))

        def __getitem__(self, key):
            return self._store[key]

        def __setitem__(self, key, val):
            self._store[key] = val

    class Minuit:
        def __init__(self, fcn, x0, grad=None, name=None):
            self._fcn = fcn
            self._grad = grad
            self._names = list(name)
            self._x = np.asarray(x0, dtype=float)
            self.errordef = 1
            self.print_level = 0
            self.values = _Access(self._names, self._x)
            self.errors = _Access(self._names, np.full(len(self._x), 0.1))
            self.limits = _Access(self._names,
                                  [(None, None)] * len(self._x))
            calls.setdefault('constructed', []).append(self._names)

        def migrad(self, ncall=None):
            # "fit" = one damped Newton step on the quadratic stub chi2
            calls.setdefault('migrad', []).append(
                dict(names=list(self._names), ncall=ncall,
                     used_grad=self._grad is not None))
            from scipy.optimize import minimize as scipy_minimize
            res = scipy_minimize(self._fcn, self._x, jac=self._grad,
                                 method='BFGS')
            self._x = res.x
            for i, n in enumerate(self._names):
                self.values[n] = float(res.x[i])
            self._fval = float(res.fun)
            return self

        def hesse(self):
            calls['hesse'] = True
            return self

        @property
        def fmin(self):
            return types.SimpleNamespace(
                fval=self._fval, is_valid=True, hesse_failed=False,
                edm=1e-7)

        @property
        def covariance(self):
            class Cov:
                def __init__(self, names):
                    self._names = names

                def __getitem__(self, key):
                    n1, n2 = key
                    return 0.01 if n1 == n2 else 0.0
            return Cov(self._names)

    mod.Minuit = Minuit
    monkeypatch.setitem(sys.modules, 'iminuit', mod)
    monkeypatch.setenv('VEGA_TPU_MINIMIZER', 'migrad')
    return calls


def test_migrad_backend(stub_iminuit):
    from vega_tpu.minimizer import Minimizer

    def chi2(params):
        return ((params['bias_LYA'] + 0.1) / 0.01) ** 2 \
            + ((params['ap'] - 1.05) / 0.02) ** 2

    sample_params = {
        'limits': {'ap': (0.5, 1.5), 'bias_LYA': (-2.0, 0.0)},
        'values': {'ap': 1.0, 'bias_LYA': -0.2},
        'errors': {'ap': 0.01, 'bias_LYA': 0.01},
        'fix': {'ap': False, 'bias_LYA': False},
    }
    minimizer = Minimizer(chi2, sample_params)
    minimizer.minimize()

    # two-stage strategy through MIGRAD: bias-only pre-fit, then full
    staged = [c['names'] for c in stub_iminuit['migrad']]
    assert staged[0] == ['bias_LYA']
    assert sorted(staged[1]) == ['ap', 'bias_LYA']
    assert stub_iminuit['hesse'] is True

    assert minimizer.values['ap'] == pytest.approx(1.05, abs=1e-4)
    assert minimizer.values['bias_LYA'] == pytest.approx(-0.1, abs=1e-4)
    assert minimizer.fmin.edm == pytest.approx(1e-7)
    assert minimizer.fmin.is_valid
    # errors read back from the (stub) Minuit error view: the backend
    # wrote the configured step 0.01 in and the stub's hesse is a no-op
    assert minimizer.errors['ap'] == pytest.approx(0.01)


def test_native_edm_is_finite():
    """The native path computes edm = g.(cov g)/4 from exact derivatives."""
    from vega_tpu.minimizer import Minimizer

    def chi2(params):
        return ((params['a'] - 2.0) / 0.5) ** 2

    def grad(params):
        return {'a': 2 * (params['a'] - 2.0) / 0.25}

    def hess(params, free_names):
        return {'a': {'a': 2 / 0.25}}

    sample_params = {
        'limits': {'a': (0.0, 4.0)}, 'values': {'a': 1.0},
        'errors': {'a': 0.1}, 'fix': {'a': False},
    }
    minimizer = Minimizer(chi2, sample_params, grad_func=grad,
                          hess_func=hess)
    minimizer.minimize()
    assert np.isfinite(minimizer.fmin.edm)
    assert minimizer.fmin.edm < 1e-8
    assert minimizer.values['a'] == pytest.approx(2.0, abs=1e-6)
