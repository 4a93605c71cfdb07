#!/usr/bin/env python
"""Full Table-6 sampled set on the grid-collapse fast path, measured ON
THE REFERENCE CONFIG at production domains.

Round-4 verdict follow-up: the 31.9k evals/s headline was the
4-parameter (ap, at) BAO regime; the reference's own DR16 combined fit
samples the full Table-6 set — including drp_QSO and
sigma_velo_disp_lorentz_QSO (reference
examples/eBOSS_DR16/main_combined.ini:25-34) — and nobody had measured
what that regime gets. This script measures, on a patched copy of
`/root/reference/tests/full_configs/main.ini` (the BASELINE headline
configuration) with the Table-6-style sampled set:

  1. the 4-dim grid spec the interface derives out of the box
     (ap/at on the +-0.25 production window, drp_QSO and
     sigma_velo_disp_lorentz_QSO over their FULL sampling limits
     [-3, 3] / [0, 15]) and the anisotropic combination schedule
     (gridcollapse.plan_components) it sweeps — a few thousand nodes
     instead of the ~147k full tensor;
  2. payload build wall time, per-correlation retained modes, dc_max,
     and the held-out probe bound (probe_err);
  3. grid-vs-dense |delta chi2| at random interior points with ALL
     sampled parameters varied (the end-to-end number that matters);
  4. per-eval cost proxies (retained modes x rank).

Run from anywhere; needs /root/reference mounted (copied to a temp dir
so the [sample] section can be patched — /root/reference is
read-only). Results go to benchmarks/table6_accuracy.json and are
quoted in docs/performance.md; the throughput of this regime is
measured on the v5e by `VEGA_TPU_BENCH_TABLE6=1 python bench.py`.
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

# the Table-6-style sampled set on the reference test config (mirrors
# reference examples/eBOSS_DR16/main_combined.ini [sample]; bias_eta
# naming per this config)
SAMPLE_LINES = {
    'ap': 'True',
    'at': 'True',
    'bias_eta_LYA': 'True',
    'beta_LYA': 'True',
    'bias_hcd': 'True',
    'beta_hcd': 'True',
    'beta_QSO': 'True',
    'drp_QSO': 'True',
    'sigma_velo_disp_lorentz_QSO': 'True',
    'bias_eta_SiII(1190)': '-0.02 0.',
    'bias_eta_SiII(1193)': '-0.02 0.',
    'bias_eta_SiIII(1207)': '-0.02 0.',
    'bias_eta_SiII(1260)': '-0.02 0.',
}


def patch_config(workdir):
    """Copy the reference tests tree and rewrite [sample]."""
    shutil.copytree('/root/reference/tests', workdir, dirs_exist_ok=True)
    import configparser
    path = os.path.join(workdir, 'full_configs', 'main.ini')
    config = configparser.ConfigParser()
    config.optionxform = str
    config.read(path)
    config['sample'] = SAMPLE_LINES
    with open(path, 'w') as fh:
        config.write(fh)
    return path


def random_points(spec, limits, rng, n_pts):
    pts = []
    for _ in range(n_pts):
        p = {}
        for name, lo, hi in zip(spec.names, spec.lo, spec.hi):
            w = hi - lo
            p[name] = float(rng.uniform(lo + 0.02 * w, hi - 0.02 * w))
        for name, (lo, hi) in limits.items():
            if name in p:
                continue
            p[name] = float(rng.uniform(lo, hi))
        pts.append(p)
    return pts


def main():
    os.environ.setdefault('VEGA_TPU_GRID_COLLAPSE', '1')
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)

    from vega_tpu.vega_interface import VegaInterface

    workdir = tempfile.mkdtemp(prefix='table6_ref_')
    patch_config(workdir)
    os.chdir(workdir)
    config = 'full_configs/main.ini'

    t0 = time.time()
    vega = VegaInterface(config)
    names = tuple(sorted(vega.sample_params['limits']))
    payload = vega.get_collapsed(names)
    build_s = time.time() - t0
    spec = payload['__grid__']
    print(f'sweep+build {build_s:.1f}s  {spec}', file=sys.stderr)

    from vega_tpu.gridcollapse import plan_components
    components = plan_components(spec)
    swept = int(sum(np.prod(d) for d, _ in components))

    per_corr = {}
    for name in payload:
        if name == '__grid__':
            continue
        p = payload[name]
        per_corr[name] = {
            'kept_A': int(p['modes_A'].shape[1]),
            'rank_A': int(p['B_A'].shape[1]),
            'kept_sy': int(p['modes_sy'].shape[1]),
            'rank_sy': int(p['B_sy'].shape[1]),
            'n_terms': int(p['cref'].shape[0]),
            'dc_max': float(p['dc_max']),
            'probe_err': float(p['probe_err']),
        }

    # grid-vs-dense at random interior points, ALL sampled params varied
    rng = np.random.default_rng(42)
    n_pts = int(os.environ.get('VEGA_TPU_TABLE6_POINTS', 15))
    limits = {n: (float(lo), float(hi))
              for n, (lo, hi) in vega.sample_params['limits'].items()}
    # restrict the nuisance draws to a realistic neighborhood (the
    # full [-0.02, 0] metal-bias boxes etc. are what the sampler
    # explores; draw within them)
    pts = random_points(spec, limits, rng, n_pts)

    t0 = time.time()
    chi2_grid = np.array([vega.chi2(dict(p)) for p in pts])
    grid_eval_s = time.time() - t0

    os.environ['VEGA_TPU_GRID_COLLAPSE'] = '0'
    vega_dense = VegaInterface(config)
    t0 = time.time()
    chi2_dense = np.array([vega_dense.chi2(dict(p)) for p in pts])
    dense_eval_s = time.time() - t0
    os.environ['VEGA_TPU_GRID_COLLAPSE'] = '1'

    err = np.abs(chi2_grid - chi2_dense)
    result = {
        'config': 'reference tests/full_configs/main.ini + Table-6 [sample]',
        'sampled': sorted(names),
        'spec': repr(spec),
        'components': [[list(map(int, d)), float(c)] for d, c in components],
        'swept_nodes': swept,
        'full_tensor_nodes': int(spec.n_nodes),
        'sweep_build_s': round(build_s, 1),
        'per_corr': per_corr,
        'grid_vs_dense': {
            'n_points': n_pts,
            'max_abs_dchi2': float(err.max()),
            'mean_abs_dchi2': float(err.mean()),
            'chi2_range': [float(chi2_dense.min()),
                           float(chi2_dense.max())],
            'grid_eval_s': round(grid_eval_s, 2),
            'dense_eval_s': round(dense_eval_s, 2),
        },
    }

    out = os.environ.get('VEGA_TPU_TABLE6_OUT') or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'table6_accuracy.json')
    with open(out, 'w') as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result, indent=2))
    return 0


if __name__ == '__main__':
    sys.exit(main())
