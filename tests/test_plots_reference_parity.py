"""Wedge/Shell/RtWedge numerics against the LIVE reference modules.

The reference's plot-compression classes (vega/plots/wedges.py,
shell.py, rt_wedges.py) are pure-numpy and import nothing else, so they
are loaded standalone (bypassing the vega package and its heavy
dependencies) and compared head-to-head: identical oversampled weight
matrices, identical applied wedges, and identical propagated
covariances on seeded random inputs. This pins the L6 plotting
numerics the same way the goldens pin the likelihood."""

import importlib
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF_PLOTS = Path('/root/reference/vega/plots')

pytestmark = pytest.mark.skipif(not REF_PLOTS.exists(),
                                reason='reference checkout not present')


@pytest.fixture(scope='module')
def refplots():
    """The reference plot modules as a synthetic standalone package."""
    pkg = types.ModuleType('refplots')
    pkg.__path__ = [str(REF_PLOTS)]
    sys.modules['refplots'] = pkg
    try:
        yield {
            'wedges': importlib.import_module('refplots.wedges'),
            'shell': importlib.import_module('refplots.shell'),
            'rt_wedges': importlib.import_module('refplots.rt_wedges'),
        }
    finally:
        for name in list(sys.modules):
            if name.startswith('refplots'):
                del sys.modules[name]


def _random_inputs(n, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=n)
    a = rng.normal(size=(n, n)) / np.sqrt(n)
    cov = 0.05 * a @ a.T + np.diag(1 + rng.uniform(size=n))
    return data, cov


WEDGE_CASES = [
    dict(),                                             # defaults
    dict(mu=(0.0, 0.5)),
    dict(mu=(0.5, 0.8), r=(10., 180., 40)),
    # cross-correlation shape: rp covers negative separations
    dict(rp=(-200., 200., 100), mu=(-1.0, 1.0), abs_mu=False),
    dict(rp=(-200., 200., 100), mu=(0.8, 1.0), abs_mu=True),
    dict(scaling=5),
]


@pytest.mark.parametrize('kwargs', WEDGE_CASES)
def test_wedge_matches_reference(refplots, kwargs):
    theirs = refplots['wedges'].Wedge(**kwargs)
    from vega_tpu.plots.wedges import Wedge
    ours = Wedge(**kwargs)

    np.testing.assert_array_equal(ours.weights, theirs.weights)
    np.testing.assert_allclose(ours.r, theirs.r, rtol=0, atol=1e-15)

    n = ours.weights.shape[1]
    data, cov = _random_inputs(n, seed=1)
    r_o, w_o, c_o = ours(data, cov)
    r_t, w_t, c_t = theirs(data, cov)
    np.testing.assert_allclose(w_o, w_t, rtol=1e-12)
    np.testing.assert_allclose(c_o, c_t, rtol=1e-12)
    # covariance-less path
    np.testing.assert_allclose(ours(data)[1], theirs(data)[1], rtol=1e-12)


SHELL_CASES = [
    dict(),
    dict(angle_var='mu', angle_range=(0., 1.)),
    dict(angle_var='mu2', angle_range=(-1., 1.), r=(40, 60)),
    dict(rp=(-200., 200., 100), abs_mu=True),
    dict(num_bins_fraction=25, scaling=5),
]


@pytest.mark.parametrize('kwargs', SHELL_CASES)
def test_shell_matches_reference(refplots, kwargs):
    theirs = refplots['shell'].Shell(**kwargs)
    from vega_tpu.plots.shell import Shell
    ours = Shell(**kwargs)

    np.testing.assert_array_equal(ours.weights, theirs.weights)

    n = ours.weights.shape[1]
    data, cov = _random_inputs(n, seed=2)
    a_o, s_o, c_o = ours(data, cov)
    a_t, s_t, c_t = theirs(data, cov)
    np.testing.assert_allclose(a_o, a_t, rtol=1e-14)
    np.testing.assert_allclose(s_o, s_t, rtol=1e-12)
    np.testing.assert_allclose(c_o, c_t, rtol=1e-12)


RT_CASES = [
    dict(),
    dict(rt_cut=(4., 12.)),
    dict(rp=(-200., 200., 100), rt_cut=(0., 8.)),
]


@pytest.mark.parametrize('kwargs', RT_CASES)
def test_rt_wedge_matches_reference(refplots, kwargs):
    theirs = refplots['rt_wedges'].RtWedge(**kwargs)
    from vega_tpu.plots.rt_wedges import RtWedge
    ours = RtWedge(**kwargs)

    np.testing.assert_array_equal(ours.weights, theirs.weights)
    np.testing.assert_allclose(ours.r, theirs.r, rtol=0, atol=1e-15)

    n = ours.weights.shape[1]
    data, cov = _random_inputs(n, seed=3)
    _, w_o, c_o = ours(data, cov)
    _, w_t, c_t = theirs(data, cov)
    np.testing.assert_allclose(w_o, w_t, rtol=1e-12)
    np.testing.assert_allclose(c_o, c_t, rtol=1e-12)
