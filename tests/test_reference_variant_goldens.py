"""Model-feature variant parity against goldens from a LIVE reference run.

tests/tools/make_reference_variant_goldens.py executes the ACTUAL
reference (/root/reference, through the tests/refshims dependency
shims) on config variants that toggle the model axes the base main.ini
does not exercise — HCD fvoigt/sinc, gaussian velocity dispersion,
Croom z-evolution, McDonald NL, aiso_epsilon / phi_alpha /
smooth-scaling / full-shape-alpha scale modes, old growth function,
relativistic + standard-asymmetry cross terms — and records chi2 and
log_lik at parameter points. Both frameworks read the SAME generated
config files (tests/tools/variant_configs.py), so a mismatch here is a
model discrepancy, not a config-interpretation one.

Cost control (the suite compiles ~40 distinct XLA graphs otherwise):
one ``VegaInterface`` per variant is built once and shared across the
parity / scan / fit tests (``_interface_for``), and every plain-chi2
assert is evaluated at a single per-variant canonical key set — the
union of all sampled names appearing anywhere in that variant's golden
entry, with absent names filled explicitly at their config defaults
(``vega.params``). Passing a default explicitly is numerically
identical to letting the parameter collapse bake it in (the reference
fills missing names from the same INI), so every point still checks
the same golden value, but the suite traces/compiles ONE chi2 graph
per variant instead of one per (point, key-set). Multi-key-set
collapse coverage is retained by test_reference_goldens.py, which
evaluates the base config under several different sampled-key sets.

Reference anchors: power_spectrum.py:128-188/291-303/427-428,
correlation_func.py:71-104/316-371, scale_parameters.py:20-230,
pktoxi.py:346-379.
"""

import json
import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
GOLDENS = REPO / 'tests' / 'data' / 'reference_variant_goldens.json'
REF = Path('/root/reference')

sys.path.insert(0, str(REPO / 'tests' / 'tools'))
from variant_configs import VARIANTS, build_variant  # noqa: E402

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REF.exists(),
                       reason='reference checkout not present'),
    pytest.mark.skipif(not GOLDENS.exists(),
                       reason='run tests/tools/'
                              'make_reference_variant_goldens.py first'),
]


@pytest.fixture(scope='module')
def goldens():
    raw = json.loads(GOLDENS.read_text())
    # legacy bare-list entries -> {'points': [...]}
    return {name: (entry if isinstance(entry, dict)
                   else {'points': entry})
            for name, entry in raw.items()}


# One interface per variant, shared by the parity/scan/fit tests below
# (ample RAM; rebuilding retraces and recompiles the chi2 graph).
_IFACES = {}


@pytest.fixture(scope='module', autouse=True)
def _drop_interfaces_at_module_end():
    yield
    _IFACES.clear()


def _interface_for(variant, tmp_path):
    """Build (or reuse) the variant's VegaInterface with the exact
    dense pipeline (grid collapse off; the caller keeps the env pinned
    for the duration of the test, so later traces stay dense too)."""
    if variant not in _IFACES:
        from vega_tpu.vega_interface import VegaInterface
        main_ini = build_variant(variant, tmp_path)
        cwd = os.getcwd()
        os.chdir(REF / 'tests')
        try:
            _IFACES[variant] = VegaInterface(str(main_ini))
        finally:
            os.chdir(cwd)
    return _IFACES[variant]


def _canonical_names(entry):
    """Union of every sampled name appearing in the variant's golden
    entry (points, scan rows, fit vector)."""
    names = set()
    for point in entry.get('points', ()):
        names |= set(point['params'])
    fit = entry.get('fit')
    if fit is not None:
        names |= set(fit['names'])
    scan = entry.get('scan')
    if scan is not None:
        for row in scan['rows']:
            names |= set(row['values'])
            names |= set(row) - {'values', 'fval'}
    return names


def _fill_defaults(vega, names, params):
    """Extend ``params`` toward the canonical key set, filling absent
    names explicitly at their config defaults — numerically identical
    to the implicit fill, because the interface starts every evaluation
    from ``self.params`` and overlays the sampled values.

    Names with NO config default are skipped, not invented: their
    fallback lives inside the model code, and absence can even select a
    different branch (``model.py`` precomputes the DESI-syst template
    when ``desi_inst_sys_amp`` is unsampled), so the only faithful
    treatment is to keep them out of the key set unless the golden
    point itself samples them. Such variants trace one extra graph for
    the points that do sample the implicit-default name."""
    full = dict(params)
    for name in names:
        if name not in full and name in vega.params:
            full[name] = float(vega.params[name])
    return full


@pytest.mark.parametrize('variant', sorted(VARIANTS))
def test_variant_parity_with_live_reference(variant, goldens, tmp_path,
                                            monkeypatch):
    """chi2/log_lik agreement on every recorded point of the variant,
    via the exact dense pipeline (grid collapse off).

    The residual floor is the refshims transform-offset difference
    (tests/refshims/README.md), not a model discrepancy: measured
    model-vector maxabs vs the live reference is ~1.8e-6 on the BASE
    config and ~2.0e-6 on most variants (same floor, no added error),
    which projects to chi2 deltas up to ~8e-7 at the base chi2 scale —
    hence the default abs=2e-6 vs test_reference_goldens' 5e-7 (whose
    points sit closer to the residual null space). Variants whose
    points amplify that same floor (large residuals or boosted metal
    biases) carry a documented per-variant tolerance in VARIANTS; each
    stays well below the variant's discriminating chi2 shift, so the
    assert still proves the toggled branch is the one that ran."""
    if variant not in goldens:
        pytest.skip(f'no golden for {variant} yet — regenerate with '
                    'tests/tools/make_reference_variant_goldens.py')
    monkeypatch.setenv('VEGA_TPU_GRID_COLLAPSE', '0')
    entry = goldens[variant]
    tol = VARIANTS[variant].get('chi2_abs_tol', 2e-6)

    vega = _interface_for(variant, tmp_path)
    names = _canonical_names(entry)
    for point in entry['points']:
        params = _fill_defaults(vega, names, point['params'])
        assert vega.chi2(params) == pytest.approx(
            point['chi2'], rel=1e-6, abs=tol), \
            f'{variant}: chi2 mismatch at {point["params"]}'
    first = entry['points'][0]
    # |delta log_lik| = |delta chi2| / 2 at fixed covariance
    assert vega.log_lik(_fill_defaults(vega, names, first['params'])) \
        == pytest.approx(first['log_lik'], rel=1e-9, abs=tol / 2), \
        f'{variant}: log_lik mismatch'


SCAN_VARIANTS = sorted(v for v in VARIANTS if 'scan' in VARIANTS[v])


@pytest.mark.parametrize('variant', SCAN_VARIANTS)
def test_variant_scan_parity_with_live_reference(variant, goldens,
                                                 tmp_path, monkeypatch):
    """Profile-likelihood scan parity: the live reference's
    Analysis.chi2_scan semantics (fix the scanned parameter, re-minimize
    every other sampled parameter; reference analysis.py:53-124) against
    vega_tpu's scan driver on the same grid — chi2-function agreement at
    the reference's per-point minima, and our (batched, default) scan
    reaching the same profile values with the same re-minimized
    parameters."""
    scan = goldens.get(variant, {}).get('scan')
    if scan is None:
        pytest.skip(f'no scan golden for {variant} yet — regenerate with '
                    'tests/tools/make_reference_variant_goldens.py')
    monkeypatch.setenv('VEGA_TPU_GRID_COLLAPSE', '0')
    spec = VARIANTS[variant]['scan']
    if 'param' in spec:          # legacy 1D golden format
        scanned = [spec['param']]
        grids = {spec['param']: spec['grid']}
    else:
        scanned = list(spec['params'])
        grids = spec['grids']

    vega = _interface_for(variant, tmp_path)
    names = _canonical_names(goldens[variant])
    # chi2-FUNCTION parity at every per-point reference minimum
    # (floor: see test_variant_parity_with_live_reference)
    for row in scan['rows']:
        point = dict(row['values'])
        point.update({p: row[p] for p in scanned})
        assert vega.chi2(_fill_defaults(vega, names, point)) \
            == pytest.approx(row['fval'], rel=1e-6, abs=2e-6), \
            f'{variant}: chi2 mismatch at {point}'

    # our own scan driver over the same grid (C order both sides)
    vega.main_config['chi2 scan'] = {
        p: f'{grids[p][0]} {grids[p][-1]} {len(grids[p])}'
        for p in scanned}
    ours = vega.analysis.chi2_scan()
    assert len(ours) == len(scan['rows'])
    for mine, ref in zip(ours, scan['rows']):
        fixed = {p: ref[p] for p in scanned}
        for p in scanned:
            assert mine[p] == pytest.approx(ref[p], abs=1e-12)
        # at least as low as the reference's tightly-converged
        # profile point (up to our scan's convergence floor), and
        # in the same basin (not spuriously lower)
        assert mine['fval'] <= ref['fval'] + 2e-5, \
            f'{variant}: profile above reference at {fixed}'
        assert mine['fval'] >= ref['fval'] - 2.5e-4
        for name in scan['minimize']:
            assert mine[name] == pytest.approx(ref['values'][name],
                                               abs=5e-3), \
                f'{variant}: scan param mismatch for {name} at {fixed}'


FIT_VARIANTS = sorted(v for v in VARIANTS if 'fit' in VARIANTS[v])


@pytest.mark.parametrize('variant', FIT_VARIANTS)
def test_variant_fit_parity_with_live_reference(variant, goldens, tmp_path,
                                                monkeypatch):
    """Fit parity in the non-default scale parametrisations
    (aiso_epsilon, phi_alpha): the live reference's tightly-converged
    bounded minimum is reproduced — chi2-function agreement at their
    best point, our exact gradient is (feasibly) flat there, and our
    own minimizer lands at the same parameters at least as low."""
    fit = goldens.get(variant, {}).get('fit')
    if fit is None:
        pytest.skip(f'no fit golden for {variant} yet — regenerate with '
                    'tests/tools/make_reference_variant_goldens.py')
    monkeypatch.setenv('VEGA_TPU_GRID_COLLAPSE', '0')
    ref_best = dict(zip(fit['names'], fit['values']))
    bounds = VARIANTS[variant]['fit']['bounds']

    vega = _interface_for(variant, tmp_path)
    names = _canonical_names(goldens[variant])
    # chi2-FUNCTION parity at the reference's minimum (floor: see
    # test_variant_parity_with_live_reference)
    assert vega.chi2(_fill_defaults(vega, names, ref_best)) \
        == pytest.approx(fit['fval'], rel=1e-6, abs=2e-6)
    # our exact gradient is feasibly flat at their minimum: project
    # out components blocked by an active bound, as the EDM does
    grads = vega.chi2_gradient(dict(ref_best))
    for name in fit['names']:
        g = grads[name]
        lo, hi = bounds[name]
        x = ref_best[name]
        eps = 1e-8 * max(1.0, abs(x))
        if (lo is not None and x <= lo + eps and g > 0) or \
           (hi is not None and x >= hi - eps and g < 0):
            continue
        assert abs(g) < 5e-4, \
            f'{variant}: gradient not flat at ref minimum for {name}'
    # our own fit reaches the same point, at least as low
    cwd = os.getcwd()
    os.chdir(REF / 'tests')
    try:
        vega.minimize()
    finally:
        os.chdir(cwd)
    values = dict(vega.bestfit.values)
    for name in fit['names']:
        assert values[name] == pytest.approx(ref_best[name],
                                             abs=2e-3), \
            f'{variant}: best-fit mismatch for {name}'
    assert vega.bestfit.fmin.fval <= fit['fval'] + 1e-6
