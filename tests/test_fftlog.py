import numpy as np
import pytest
from scipy.fft import fht
from scipy.integrate import quad

from vega_tpu.ops.fftlog import FFTLogP2Xi


@pytest.fixture(scope='module')
def k_grid():
    # Same shape as the shipped fiducial templates: 814 log-spaced points
    return np.logspace(np.log10(1e-4), np.log10(1152.5), 814)


def test_operator_matches_transform(k_grid):
    pk = np.exp(-((np.log(k_grid) - np.log(0.1)) ** 2))
    for ell in (0, 2, 4, 6):
        f = FFTLogP2Xi(k_grid, ell)
        direct = f.transform(pk)
        via_op = f.operator() @ pk
        np.testing.assert_allclose(via_op, direct, rtol=0, atol=1e-13)


def test_against_scipy_fht(k_grid):
    """Cross-check the FFTLog discretization against scipy's independent
    implementation of the same algorithm."""
    pk = np.exp(-((np.log(k_grid) - np.log(0.05)) ** 2) / 2)
    delta = np.log(k_grid[-1] / k_grid[0]) / (len(k_grid) - 1)
    for ell in (0, 2):
        # pad_to=0: scipy.fft.fht has no zero-padding, so compare the
        # unpadded discretization (the padded default differs from it by
        # the suppressed aliasing, ~1e-5 pointwise)
        f = FFTLogP2Xi(k_grid, ell, pad_to=0)
        a = pk * k_grid ** 1.5
        big_a = fht(a, delta, mu=ell + 0.5, offset=f.lnxy, bias=0)
        sign = -1.0 if (ell // 2) % 2 else 1.0
        xi_scipy = (sign / (2 * np.pi ** 2) * np.sqrt(np.pi / 2)
                    * f.r_grid ** -1.5 * big_a)
        mine = f.transform(pk)
        np.testing.assert_allclose(mine, xi_scipy, rtol=0, atol=1e-12)


def test_monopole_against_quadrature(k_grid):
    """Physics check: xi_0(r) = 1/(2 pi^2) int k^2 j_0(kr) P(k) dk."""
    pk = np.exp(-k_grid ** 2 / 2)
    f = FFTLogP2Xi(k_grid, 0)
    xi = f.transform(pk)

    def truth(r):
        val = quad(lambda kk: kk ** 2 * np.exp(-kk ** 2 / 2)
                   * np.sinc(kk * r / np.pi), 0, 30, limit=500)[0]
        return val / (2 * np.pi ** 2)

    for r_target in (0.5, 1.0, 3.0):
        j = np.argmin(np.abs(f.r_grid - r_target))
        r = f.r_grid[j]
        assert xi[j] == pytest.approx(truth(r), rel=1e-6, abs=1e-12)


def test_quadrupole_against_quadrature(k_grid):
    """xi_2(r) = -1/(2 pi^2) int k^2 j_2(kr) P(k) dk."""
    from scipy.special import spherical_jn
    pk = np.exp(-k_grid ** 2 / 2)
    f = FFTLogP2Xi(k_grid, 2)
    xi = f.transform(pk)

    def truth(r):
        val = quad(lambda kk: kk ** 2 * np.exp(-kk ** 2 / 2)
                   * spherical_jn(2, kk * r), 0, 30, limit=500)[0]
        return -val / (2 * np.pi ** 2)

    for r_target in (1.0, 3.0):
        j = np.argmin(np.abs(f.r_grid - r_target))
        assert xi[j] == pytest.approx(truth(f.r_grid[j]), rel=1e-6, abs=1e-12)


def test_r_grid_reciprocal(k_grid):
    f = FFTLogP2Xi(k_grid, 0)
    np.testing.assert_allclose(f.r_grid * k_grid[::-1], np.exp(f.lnxy))
    assert np.all(np.diff(f.r_grid) > 0)
    # r grid covers the analysis range [10, 180] comfortably
    assert f.r_grid[0] < 1 and f.r_grid[-1] > 1000


def test_lowring_false_against_scipy(k_grid):
    """fht_lowring = False (reference pktoxi.py:42,53 -> mcfit
    P2xi(lowring=False)): the log-r phase offset is 0 instead of the
    ringing-minimizing value, shifting every output r node. The
    chi2-level live-reference oracles cannot discriminate this (the
    downstream spline re-absorbs the node shift to ~1e-11), so the
    discretization is pinned here against scipy's independent FFTLog."""
    pk = np.exp(-((np.log(k_grid) - np.log(0.05)) ** 2) / 2)
    delta = np.log(k_grid[-1] / k_grid[0]) / (len(k_grid) - 1)
    for ell in (0, 2):
        f = FFTLogP2Xi(k_grid, ell, lowring=False, pad_to=0)
        assert f.lnxy == 0.0
        # offset 0: r grid exactly reciprocal to the k grid
        np.testing.assert_allclose(f.r_grid * k_grid[::-1], 1.0)
        a = pk * k_grid ** 1.5
        big_a = fht(a, delta, mu=ell + 0.5, offset=0.0, bias=0)
        sign = -1.0 if (ell // 2) % 2 else 1.0
        xi_scipy = (sign / (2 * np.pi ** 2) * np.sqrt(np.pi / 2)
                    * f.r_grid ** -1.5 * big_a)
        np.testing.assert_allclose(f.transform(pk), xi_scipy,
                                   rtol=0, atol=1e-12)
