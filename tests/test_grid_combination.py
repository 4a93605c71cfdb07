"""Anisotropic combination-technique node grids for 3+ grid dimensions
(vega_tpu/gridcollapse.py: plan_components / build_grid_payload).

The full Table-6 BAO regime samples FOUR nonlinear scale parameters
(ap, at, drp_QSO, sigma_velo_disp_lorentz_QSO — reference
examples/eBOSS_DR16/main_combined.ini [sample]); a full tensor of
Chebyshev nodes at production degrees is ~147k dense sweep evaluations,
hours on a single-core host. The combination schedule sweeps a few
thousand instead: every PAIR of dimensions at full tensor resolution
(the (ap, at) chi^2 ridge oscillates diagonally on the BAO scale, so
joint high modes are physical), 3+-way interactions at mid resolution,
summed with telescoping coefficients into ONE sparse-mode payload
served by the unchanged per-eval graph.

These tests pin the algebra (exactness on the polynomial union space,
telescoping coefficient identities, downward closure), the planning
thresholds, and the end-to-end 3-dim combination payload against both
the full-tensor payload and the dense pipeline.
"""

import tempfile
from pathlib import Path

import numpy as np
import pytest

from vega_tpu.gridcollapse import (GridSpec, cheb_transform_matrix,
                                   component_nodes, plan_components)


def _spec(degrees):
    d = len(degrees)
    return GridSpec([f'p{i}' for i in range(d)], [-1.0] * d, [1.0] * d,
                    degrees, [0.0] * d)


def test_plan_tensor_below_threshold():
    # 2 dims, and small 3-dim grids, stay a single full tensor
    assert plan_components(_spec((32, 32))) == [((32, 32), 1.0)]
    assert plan_components(_spec((12, 12, 8))) == [((12, 12, 8), 1.0)]


def test_plan_combination_above_threshold():
    comps = plan_components(_spec((32, 32, 12, 12)))
    assert len(comps) > 1
    total = sum(int(np.prod(d)) for d, _ in comps)
    assert total < 10_000                      # vs 147456 full tensor
    # telescoping identity: the constant function is reproduced
    assert sum(c for _, c in comps) == pytest.approx(1.0)
    # every pair of dimensions reaches full joint resolution
    degs = {d for d, _ in comps}
    for i in range(4):
        for j in range(i + 1, 4):
            full = [1, 1, 1, 1]
            full[i], full[j] = (32, 32, 12, 12)[i], (32, 32, 12, 12)[j]
            assert tuple(full) in degs, (i, j)


def test_plan_mode_overrides():
    spec = _spec((32, 32, 12, 12))
    assert plan_components(spec, mode='never') == [((32, 32, 12, 12), 1.0)]
    assert len(plan_components(_spec((8, 8, 6)), mode='always')) > 1
    # interaction order 4 adds the mid-level 4-way component (the
    # total component COUNT can shrink — new telescoping coefficients
    # zero out some lower terms)
    comps3 = plan_components(spec, order=3)
    comps4 = plan_components(spec, order=4)
    assert any(all(v > 1 for v in d) for d, _ in comps4)
    assert not any(all(v > 1 for v in d) for d, _ in comps3)
    assert sum(c for _, c in comps4) == pytest.approx(1.0)


def _combination_interpolate(spec, comps, f, pts):
    """Evaluate the combination interpolant of f at pts (host numpy)."""
    acc = {}
    for degs, w in comps:
        nodes = component_nodes(spec, degs)
        coef = f(nodes).reshape(degs)
        for ax, deg in enumerate(degs):
            coef = np.moveaxis(np.tensordot(
                cheb_transform_matrix(deg), coef, axes=(1, ax)), 0, ax)
        for idx, v in zip(np.ndindex(*degs), coef.ravel()):
            acc[idx] = acc.get(idx, 0.0) + w * v

    def cheb_vals(x, n):
        tv = np.empty((len(x), n))
        tv[:, 0] = 1.0
        if n > 1:
            tv[:, 1] = x
        for k in range(2, n):
            tv[:, k] = 2 * x * tv[:, k - 1] - tv[:, k - 2]
        return tv

    tvs = [cheb_vals(pts[:, d], spec.degrees[d])
           for d in range(len(spec.degrees))]
    out = np.zeros(len(pts))
    for idx, v in acc.items():
        term = np.full(len(pts), v)
        for d, k in enumerate(idx):
            term *= tvs[d][:, k]
        out += term
    return out


def test_combination_exact_on_union_space():
    """The combination reproduces EXACTLY any polynomial in the union
    of its component tensor spaces (the standard Smolyak telescoping
    identity) — full pair interactions and mid-level 3-way terms.
    Ladders here: 8 -> (1, 4, 8), 6 -> (1, 3, 6)."""
    spec = _spec((8, 8, 6))
    comps = plan_components(spec, mode='always')

    def f(pts):
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        return (x ** 7 * y ** 7          # full (x, y) pair, level (2, 2)
                + y ** 5 * z ** 5        # full (y, z) pair
                + 0.5 * x ** 3 * y ** 2 * z ** 2   # 3-way at mid levels
                + x + 2.0)

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, size=(64, 3))
    approx = _combination_interpolate(spec, comps, f, pts)
    np.testing.assert_allclose(approx, f(pts), atol=1e-12)


def test_combination_misses_out_of_space_terms():
    """Sanity check of the error model: a term OUTSIDE the union space
    (a 3-way interaction beyond the mid degrees) is NOT reproduced —
    this is exactly what build_grid_payload's held-out probe validation
    measures and warns about on real payloads."""
    spec = _spec((8, 8, 6))
    comps = plan_components(spec, mode='always')

    def f(pts):
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        return x ** 5 * y ** 5 * z ** 5

    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, size=(64, 3))
    approx = _combination_interpolate(spec, comps, f, pts)
    assert np.abs(approx - f(pts)).max() > 1e-3


@pytest.mark.slow
def test_combination_payload_end_to_end(monkeypatch):
    """3-dim (ap, at, drp_QSO) grid collapse through the combination
    schedule on the synthetic cross config: matches the full-tensor
    payload and the dense pipeline within the node-convergence floor,
    reports the held-out probe bound, and the fingerprints of the two
    schedules differ (separate disk-cache entries)."""
    from vega_tpu.testing import make_synthetic_dataset
    from vega_tpu.vega_interface import VegaInterface

    sample = {'ap': 'True', 'at': 'True', 'drp_QSO': 'True',
              'bias_LYA': 'True', 'beta_LYA': 'True'}
    # narrowed domains so the mid-level (half-degree) component grids
    # are themselves converged on this sharp near-noiseless config —
    # the wide-domain behavior on REAL covariance is measured on the
    # reference config by benchmarks/table6_accuracy.py
    ctrl = ('grid-domain-pad = 0.1\n'
            'grid-nodes-ap = 12\ngrid-nodes-at = 12\n'
            'grid-nodes-drp_QSO = 8\ngrid-domain-drp_QSO = -1.0 1.0\n')
    wd_c = Path(tempfile.mkdtemp(prefix='vega_tpu_comb_'))
    main_c = make_synthetic_dataset(
        wd_c, cross=True, size='tiny', sample=sample,
        extra_control=ctrl + 'grid-combination = always\n')
    wd_t = Path(tempfile.mkdtemp(prefix='vega_tpu_combt_'))
    main_t = make_synthetic_dataset(
        wd_t, cross=True, size='tiny', sample=sample,
        extra_control=ctrl + 'grid-combination = never\n')

    names = ('ap', 'at', 'drp_QSO', 'bias_LYA', 'beta_LYA')
    rng = np.random.default_rng(5)
    pts = [{'ap': 1 + rng.uniform(-.08, .08),
            'at': 1 + rng.uniform(-.08, .08),
            'drp_QSO': rng.uniform(-0.8, 0.8),
            'bias_LYA': -0.117 * (1 + 0.05 * rng.normal()),
            'beta_LYA': 1.67 * (1 + 0.05 * rng.normal())}
           for _ in range(8)]

    vega_c = VegaInterface(main_c)
    payload = vega_c.get_collapsed(names)
    spec = payload['__grid__']
    assert spec.names == ('ap', 'at', 'drp_QSO')
    # the payload records the held-out probe bound of the SERVED
    # interpolant vs the exact collapse
    for name in payload:
        if name != '__grid__':
            assert np.isfinite(float(payload[name]['probe_err']))
    chi_c = np.array([vega_c.chi2(dict(p)) for p in pts])

    vega_t = VegaInterface(main_t)
    chi_t = np.array([vega_t.chi2(dict(p)) for p in pts])

    monkeypatch.setenv('VEGA_TPU_GRID_COLLAPSE', '0')
    vega_d = VegaInterface(main_t)
    chi_d = np.array([vega_d.chi2(dict(p)) for p in pts])

    assert np.all(np.isfinite(chi_c))
    # combination vs full tensor: the schedule truncation error, well
    # under the node-convergence floor on these narrowed domains
    np.testing.assert_allclose(chi_c, chi_t, rtol=1e-4, atol=5e-2)
    # and both track the dense pipeline
    np.testing.assert_allclose(chi_c, chi_d, rtol=1e-3, atol=0.2)
