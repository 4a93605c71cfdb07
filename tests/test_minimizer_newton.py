"""Unit coverage for the projected active-set Newton polish.

The serial minimizer finishes L-BFGS-B with damped Newton steps on the
exact Hessian (minimizer.py:_newton_polish). On a quadratic chi^2 the
polished minimum must be exact to machine precision in one step, and a
component pinned at a bound with the gradient pushing outward must stay
pinned (the feasible constrained minimum, matching MIGRAD's behavior at
limits — reference minimizer.py:69-98 delegates this to iminuit)."""

import numpy as np
import pytest

from vega_tpu.minimizer import Minimizer


def _quadratic(center, hess):
    """chi2(x) = (x-c)^T H (x-c) / 2 with analytic derivatives."""
    center = np.asarray(center, dtype=float)
    hess = np.asarray(hess, dtype=float)
    names = [f'p{i}' for i in range(len(center))]

    def vec(params):
        return np.array([params[n] for n in names], dtype=float)

    def chi2(params):
        d = vec(params) - center
        return float(d @ hess @ d / 2.0)

    def valgrad(params):
        d = vec(params) - center
        g = hess @ d
        return float(d @ hess @ d / 2.0), dict(zip(names, g))

    def hess_func(params, free_names):
        idx = [names.index(n) for n in free_names]
        sub = hess[np.ix_(idx, idx)]
        return {n1: {n2: float(sub[i, j])
                     for j, n2 in enumerate(free_names)}
                for i, n1 in enumerate(free_names)}

    return names, chi2, valgrad, hess_func


def _sample_params(names, values, limits):
    return {
        'values': dict(zip(names, values)),
        'errors': {n: 0.1 for n in names},
        'limits': {n: limits.get(n, (None, None)) for n in names},
        'fix': {n: False for n in names},
    }


def test_newton_polish_exact_on_quadratic():
    center = [0.3, -1.2, 2.5]
    hess = np.array([[4.0, 1.0, 0.0],
                     [1.0, 3.0, 0.5],
                     [0.0, 0.5, 2.0]])
    names, chi2, valgrad, hess_func = _quadratic(center, hess)
    mini = Minimizer(chi2, _sample_params(names, [0.0, 0.0, 0.0], {}),
                     valgrad_func=valgrad, hess_func=hess_func)
    mini.minimize()
    for n, c in zip(names, center):
        assert mini.values[n] == pytest.approx(c, abs=1e-9)
    assert mini.fmin.fval == pytest.approx(0.0, abs=1e-18)
    assert mini.fmin.edm < 1e-12
    # errors from cov = 2 H^-1
    cov = 2.0 * np.linalg.inv(hess)
    for i, n in enumerate(names):
        assert mini.errors[n] == pytest.approx(np.sqrt(cov[i, i]),
                                               rel=1e-8)


def test_newton_polish_respects_active_bound():
    # unconstrained minimum at p0=1.5, but p0 is bounded above at 1.0:
    # the constrained minimum pins p0=1.0 and re-minimizes p1 given the
    # coupling
    center = np.array([1.5, 0.0])
    hess = np.array([[2.0, 0.6],
                     [0.6, 1.0]])
    names, chi2, valgrad, hess_func = _quadratic(center, hess)
    mini = Minimizer(chi2, _sample_params(names, [0.0, 0.0],
                                          {'p0': (-5.0, 1.0)}),
                     valgrad_func=valgrad, hess_func=hess_func)
    mini.minimize()
    assert mini.values['p0'] == pytest.approx(1.0, abs=1e-12)
    # conditional minimum of p1 at p0=1.0: p1 = c1 - H01/H11 * (p0 - c0)
    p1_expected = center[1] - hess[0, 1] / hess[1, 1] * (1.0 - center[0])
    assert mini.values['p1'] == pytest.approx(p1_expected, abs=1e-9)
    d = np.array([1.0, p1_expected]) - center
    assert mini.fmin.fval == pytest.approx(float(d @ hess @ d / 2.0),
                                           rel=1e-12)
    # EDM projects out the pinned component -> tiny at the constrained
    # minimum even though the raw gradient along p0 is nonzero
    assert mini.fmin.edm < 1e-12


def test_restart_fallback_without_hessian_provider():
    # No hess_func: the L-BFGS-B restart polish must still converge
    # (errors come from finite differences)
    center = [0.7, -0.4]
    hess = np.array([[3.0, 0.0], [0.0, 5.0]])
    names, chi2, valgrad, hess_func = _quadratic(center, hess)
    mini = Minimizer(chi2, _sample_params(names, [0.0, 0.0], {}),
                     valgrad_func=valgrad)
    mini.minimize()
    for n, c in zip(names, center):
        assert mini.values[n] == pytest.approx(c, abs=1e-7)
