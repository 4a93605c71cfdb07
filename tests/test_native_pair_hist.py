"""Native pair-histogram kernel vs the reference numpy algebra
(reference: metals.py:543-612)."""

import numpy as np
import pytest

from vega_tpu.native import (native_available, pair_histograms,
                             pair_ratio_range)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason='no C++ toolchain')


@pytest.fixture(scope='module')
def pair_data():
    rng = np.random.default_rng(7)
    n1, n2 = 400, 300
    true_z1 = rng.uniform(1.8, 3.5, n1)
    assumed_z1 = true_z1 * rng.uniform(0.97, 1.03, n1)
    true_z2 = rng.uniform(1.8, 3.5, n2)
    assumed_z2 = true_z2 * rng.uniform(0.97, 1.03, n2)
    # monotonic pseudo-comoving distances
    dist = lambda z: 3000 * np.log(1 + z)  # noqa: E731
    return {
        'true_r1': dist(true_z1), 'assumed_r1': dist(assumed_z1),
        'true_z1': true_z1, 'assumed_z1': assumed_z1,
        'w1': rng.uniform(0, 2, n1),
        'true_r2': dist(true_z2), 'assumed_r2': dist(assumed_z2),
        'true_z2': true_z2, 'assumed_z2': assumed_z2,
        'w2': rng.uniform(0, 2, n2),
    }


def numpy_reference(d, abs_rp, zmin, zmax, rp_edges, ratio_edges,
                    rp_cut=20.0):
    """The reference's vectorized pair algebra (metals.py:543-612)."""
    tr = (d['true_r1'][:, None] - d['true_r2'][None, :]).ravel()
    ar = (d['assumed_r1'][:, None] - d['assumed_r2'][None, :]).ravel()
    if abs_rp:
        tr, ar = np.abs(tr), np.abs(ar)
    w = (d['w1'][:, None] * d['w2'][None, :]).ravel()
    zpair = ((d['assumed_z1'][:, None] + d['assumed_z2'][None, :]) / 2
             ).ravel()
    w = w * ((zpair >= zmin) & (zpair <= zmax))

    h2, _, _ = np.histogram2d(ar, tr, bins=(rp_edges, rp_edges), weights=w)
    sum_true, _ = np.histogram(tr, bins=rp_edges, weights=w)
    sum_assumed, _ = np.histogram(ar, bins=rp_edges, weights=w)
    sum_assumed_rp, _ = np.histogram(ar, bins=rp_edges, weights=w * ar)
    zmean = ((d['true_z1'][:, None] + d['true_z2'][None, :]) / 2).ravel()
    sum_z, _ = np.histogram(ar, bins=rp_edges, weights=w * zmean)

    true_md = ((d['true_r1'][:, None] + d['true_r2'][None, :]) / 2).ravel()
    assumed_md = ((d['assumed_r1'][:, None]
                   + d['assumed_r2'][None, :]) / 2).ravel()
    ratio = assumed_md / true_md
    rh, _ = np.histogram(ratio, bins=ratio_edges,
                         weights=w / true_md ** 2 * (np.abs(tr) < rp_cut))
    return h2, sum_true, sum_assumed, sum_assumed_rp, sum_z, rh, ratio


def test_pair_histograms_match_numpy(pair_data):
    rp_edges = np.linspace(-200, 200, 101)
    ratio_edges = np.linspace(0.9, 1.1, 41)
    for abs_rp in (0, 1):
        ref = numpy_reference(pair_data, abs_rp, 2.0, 3.2, rp_edges,
                              ratio_edges)
        out = pair_histograms(
            pair_data['true_r1'], pair_data['assumed_r1'],
            pair_data['true_z1'], pair_data['assumed_z1'], pair_data['w1'],
            pair_data['true_r2'], pair_data['assumed_r2'],
            pair_data['true_z2'], pair_data['assumed_z2'], pair_data['w2'],
            abs_rp, 2.0, 3.2, rp_edges, ratio_edges)
        for mine, theirs in zip(out, ref):
            # summation order differs (parallel accumulation)
            np.testing.assert_allclose(mine, theirs, rtol=1e-9, atol=1e-9)


def test_pair_ratio_range(pair_data):
    _, _, _, _, _, _, ratio = numpy_reference(
        pair_data, 0, 0.0, 10.0, np.linspace(-200, 200, 11),
        np.linspace(0.5, 1.5, 5))
    lo, hi = pair_ratio_range(
        pair_data['true_r1'], pair_data['assumed_r1'],
        pair_data['true_r2'], pair_data['assumed_r2'])
    assert lo == pytest.approx(ratio.min(), rel=1e-14)
    assert hi == pytest.approx(ratio.max(), rel=1e-14)
