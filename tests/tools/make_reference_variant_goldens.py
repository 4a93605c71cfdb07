#!/usr/bin/env python
"""Run the ACTUAL reference (/root/reference) through the dependency
shims on each model-feature config variant (variant_configs.py) and
record chi2/log_lik goldens — plus, for variants carrying a 'fit' spec,
a tightly-converged bounded scipy fit of the reference's own chi2 —
for vega_tpu's variant parity tests.

This extends the live-reference parity surface beyond the base
main.ini feature set: HCD fvoigt/sinc, gaussian velocity dispersion,
Croom z-evolution, McDonald NL, aiso_epsilon/phi_alpha/smooth-scaling/
full-shape-alpha/metal-scaling/two-alpha-smooth scale modes, old
growth, relativistic + standard asymmetry, UVB shot noise, HeII,
exp smoothing, sky broadband, pk damping, DESI instrumental
systematics — and fit-parity in the aiso_epsilon and phi_alpha
parametrisations.

Golden format per variant: {"points": [{params, chi2, log_lik}, ...],
"fit": {names, values, fval, nfev}?}.

Usage:  python tests/tools/make_reference_variant_goldens.py \
            [--only name1,name2] [out.json]

Existing goldens in the output file are kept (legacy bare-list entries
are migrated to the dict format); only the selected variants — or the
ones missing points or a spec'd fit — are regenerated and merged in.
"""

import json
import os
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
REFERENCE = Path(os.environ.get('VEGA_REFERENCE', '/root/reference'))

sys.path.insert(0, str(REPO / 'tests' / 'tools'))
from variant_configs import VARIANTS, build_variant  # noqa: E402


def _reference_fit(vega, fit_spec, defaults):
    """Bounded tightly-converged scipy fit of the live reference's chi2
    (same double-L-BFGS-B recipe as make_reference_goldens.py)."""
    import numpy as np
    from scipy.optimize import minimize

    names = list(fit_spec['names'])
    bounds = [tuple(fit_spec['bounds'][n]) for n in names]

    def chi2_of(x):
        return float(vega.chi2(dict(zip(names, (float(v) for v in x)))))

    x0 = np.array([defaults[n] for n in names])
    res = minimize(chi2_of, x0, method='L-BFGS-B', bounds=bounds,
                   options={'ftol': 1e-15, 'gtol': 1e-11,
                            'maxfun': 20000, 'maxls': 60})
    res2 = minimize(chi2_of, res.x, method='L-BFGS-B', bounds=bounds,
                    options={'ftol': 1e-15, 'gtol': 1e-12,
                             'maxfun': 20000, 'maxls': 80})
    best = res2 if res2.fun <= res.fun else res
    return {'names': names,
            'values': [float(v) for v in best.x],
            'fval': float(best.fun),
            'nfev': int(res.nfev) + int(res2.nfev)}


def _reference_scan(vega, scan_spec, defaults):
    """Profile-likelihood scan of the live reference: at each grid point
    of the scanned parameter(s), re-minimize every other sampled
    parameter (reference Analysis.chi2_scan semantics,
    analysis.py:53-124) with the same tightly-converged bounded scipy
    recipe as the fits. 1D ({'param', 'grid'}) or 2D
    ({'params', 'grids'}, C order: first param = outer loop, matching
    the reference's itertools.product)."""
    import itertools

    import numpy as np
    from scipy.optimize import minimize

    if 'param' in scan_spec:
        scanned = [scan_spec['param']]
        grids = [scan_spec['grid']]
    else:
        scanned = list(scan_spec['params'])
        grids = [scan_spec['grids'][n] for n in scanned]
    names = list(scan_spec['minimize'])
    bounds = [tuple(scan_spec['bounds'][n]) for n in names]
    x0 = np.array([defaults[n] for n in names])

    rows = []
    for point in itertools.product(*grids):
        fixed = dict(zip(scanned, (float(v) for v in point)))

        def chi2_of(x):
            params = dict(zip(names, (float(v) for v in x)))
            params.update(fixed)
            return float(vega.chi2(params))

        res = minimize(chi2_of, x0, method='L-BFGS-B', bounds=bounds,
                       options={'ftol': 1e-15, 'gtol': 1e-11,
                                'maxfun': 20000, 'maxls': 60})
        res2 = minimize(chi2_of, res.x, method='L-BFGS-B', bounds=bounds,
                        options={'ftol': 1e-15, 'gtol': 1e-12,
                                 'maxfun': 20000, 'maxls': 80})
        best = res2 if res2.fun <= res.fun else res
        rows.append({**fixed,
                     'values': dict(zip(names,
                                        (float(v) for v in best.x))),
                     'fval': float(best.fun)})
        x0 = best.x  # warm-start the neighbouring grid point
        print(f'    scan {fixed} -> fval {best.fun!r}', flush=True)
    return {'scanned': scanned, 'minimize': names, 'rows': rows}


def main(out_path=None, only=None):
    sys.path.insert(0, str(REPO / 'tests' / 'refshims'))
    sys.path.insert(0, str(REFERENCE))

    os.chdir(REFERENCE / 'tests')
    from vega import VegaInterface

    out = Path(out_path) if out_path else (
        REPO / 'tests' / 'data' / 'reference_variant_goldens.json')
    goldens = json.loads(out.read_text()) if out.exists() else {}
    # legacy bare-list entries -> {'points': [...]}
    goldens = {name: (entry if isinstance(entry, dict)
                      else {'points': entry})
               for name, entry in goldens.items()}

    def needs_run(name):
        if name not in goldens:
            return True
        if 'fit' in VARIANTS[name] and 'fit' not in goldens[name]:
            return True
        if 'scan' in VARIANTS[name] and 'scan' not in goldens[name]:
            return True
        return False

    todo = ([v.strip() for v in only.split(',')] if only
            else [v for v in VARIANTS if needs_run(v)])
    for name in todo:
        workdir = Path(tempfile.mkdtemp(prefix=f'ref_variant_{name}_'))
        main_ini = build_variant(name, workdir)
        print(f'--- {name}: {main_ini}', flush=True)
        vega = VegaInterface(str(main_ini))
        # merge into any existing entry: only MISSING sections are
        # recomputed, so adding e.g. a scan spec to an already-fitted
        # variant does not churn its committed points/fit values at the
        # optimizer-convergence floor (delete the entry to force a full
        # regeneration)
        entry = goldens.setdefault(name, {})
        if 'points' not in entry:
            points = []
            for point in VARIANTS[name]['points']:
                points.append({
                    'params': point,
                    'chi2': float(vega.chi2(point)),
                    'log_lik': float(vega.log_lik(point)),
                })
                print(f'    {point} -> chi2 {points[-1]["chi2"]!r}',
                      flush=True)
            entry['points'] = points
        fit_spec = VARIANTS[name].get('fit')
        if fit_spec and 'fit' not in entry:
            defaults = {n: float(vega.params[n])
                        for n in fit_spec['names']}
            entry['fit'] = _reference_fit(vega, fit_spec, defaults)
            print(f'    fit -> {entry["fit"]}', flush=True)
        scan_spec = VARIANTS[name].get('scan')
        if scan_spec and 'scan' not in entry:
            defaults = {n: float(vega.params[n])
                        for n in scan_spec['minimize']}
            entry['scan'] = _reference_scan(vega, scan_spec, defaults)
        del vega
        # incremental write: a crash in a later variant keeps progress
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(goldens, indent=1))

    # migrate-only invocations still rewrite the normalized format
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(goldens, indent=1))
    print(f'wrote {out}')


if __name__ == '__main__':
    argv = sys.argv[1:]
    only_arg = None
    if argv and argv[0] == '--only':
        only_arg = argv[1]
        argv = argv[2:]
    main(argv[0] if argv else None, only=only_arg)
