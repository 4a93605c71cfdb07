#!/usr/bin/env python
"""Measure the REFERENCE's single-core chi^2 throughput on this host.

Drives the actual reference package (/root/reference, run through the
dependency shims in tests/refshims — the same mechanism the golden-value
generators use) on the DR16-subset 4-correlation config
(reference tests/full_configs/main.ini) and times warm chi^2
evaluations in the two regimes the bench reports:

- nuisance-only: bias_eta_LYA / beta_LYA varied per call — the regime
  friendliest to the reference's value caches (HCD / peak-NL / FFTLog
  multipole LRUs all stay warm, reference pktoxi.py:165-193);
- BAO-sampled: (ap, at) varied per call as well — every FFTLog/spline
  cache misses, which is what actually happens in a sampler chain over
  the scale parameters.

Writes benchmarks/reference_baseline.json with median evals/s for both
regimes. bench.py uses the FASTER of the two (generous to the
reference) as its vs_baseline divisor.

Usage:  python benchmarks/reference_baseline.py [n_evals]
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
REFERENCE = Path(os.environ.get('VEGA_REFERENCE', '/root/reference'))


def time_evals(vega, points):
    """Per-call wall-clock of vega.chi2 over the given parameter points
    (list of dicts). Returns the sorted per-call times in seconds."""
    times = []
    for point in points:
        t0 = time.perf_counter()
        chi2 = vega.chi2(point)
        times.append(time.perf_counter() - t0)
        assert chi2 < 1e99, f'reference chi2 failed at {point}'
    return sorted(times)


def main(n_evals=100):
    sys.path.insert(0, str(REPO / 'tests' / 'refshims'))
    sys.path.insert(0, str(REFERENCE))

    os.chdir(REFERENCE / 'tests')
    from vega import VegaInterface

    t0 = time.perf_counter()
    vega = VegaInterface('full_configs/main.ini')
    init_s = time.perf_counter() - t0

    import numpy as np
    rng = np.random.default_rng(0)

    # Warm every cache the way a chain would: several calls at nearby
    # points before the timed section.
    for _ in range(5):
        vega.chi2({'bias_eta_LYA': -0.2008 + 1e-4 * rng.normal(),
                   'beta_LYA': 1.67 + 1e-3 * rng.normal()})

    nuisance_points = [
        {'bias_eta_LYA': -0.2008 * (1 + 0.01 * rng.normal()),
         'beta_LYA': 1.67 * (1 + 0.01 * rng.normal())}
        for _ in range(n_evals)]
    t_nuis = time_evals(vega, nuisance_points)

    for _ in range(3):
        vega.chi2({'ap': 1.0 + 0.01 * rng.normal(),
                   'at': 1.0 + 0.01 * rng.normal(),
                   'bias_eta_LYA': -0.2008, 'beta_LYA': 1.67})
    bao_points = [
        {'ap': 1.0 + 0.02 * rng.normal(),
         'at': 1.0 + 0.02 * rng.normal(),
         'bias_eta_LYA': -0.2008 * (1 + 0.01 * rng.normal()),
         'beta_LYA': 1.67 * (1 + 0.01 * rng.normal())}
        for _ in range(n_evals)]
    t_bao = time_evals(vega, bao_points)

    def stats(times):
        med = times[len(times) // 2]
        return {'median_s_per_eval': med,
                'evals_per_sec': 1.0 / med,
                'p10_s': times[len(times) // 10],
                'p90_s': times[(9 * len(times)) // 10],
                'n': len(times)}

    result = {
        'config': 'reference tests/full_configs/main.ini '
                  '(DR16-subset, 4 correlations, metals+HCD+UV+Arinyo)',
        'host': os.uname().nodename,
        'n_cores_note': 'single process, single core (the reference '
                        'chi2 is serial numpy/scipy)',
        'init_s': init_s,
        'nuisance_only': stats(t_nuis),
        'bao_sampled': stats(t_bao),
    }
    out = REPO / 'benchmarks' / 'reference_baseline.json'
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps(result, indent=1))
    print(f'wrote {out}')


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
