"""Tutorial 5 — Fisher sensitivity and chi^2 profile scans.

Counterpart of the reference's Sensitivity_tutorial.ipynb, plus the
batched on-device scan (every grid point of a profile scan minimized
simultaneously — the serial MIGRAD re-minimization loop of the
reference becomes one sharded Newton optimization).

Run:  python 05_sensitivity_and_scans.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import tempfile

import numpy as np

from vega_tpu.parallel import batched_chi2_scan
from vega_tpu.testing import make_synthetic_dataset
from vega_tpu.vega_interface import VegaInterface

workdir = tempfile.mkdtemp(prefix='vega_tutorial_')
vega = VegaInterface(make_synthetic_dataset(workdir, cross=False,
                                            size='tiny'))
vega.minimize()

# --- Exact Fisher sensitivity (jax.jacfwd, no finite differences) ----
vega.compute_sensitivity_exact(verbose=False)
sens = vega.sensitivity
part = sens['partials']['lyaxlya']['bias_LYA']
print(f'd(model)/d(bias_LYA): {part.shape} '
      '(distorted/undistorted x peak/smooth x bins)')
fisher = sens['fisher']['lyaxlya'][('bias_LYA', 'beta_LYA')]
print(f'Fisher(bias, beta) along rp: {fisher.shape}')

# --- 1D profile scan: all grid points minimized at once --------------
grid = {'bias_LYA': np.linspace(-0.125, -0.109, 9)}
results = batched_chi2_scan(vega, grid)
print('\nbias_LYA profile:')
for row in results[::2]:
    print(f'  bias = {row["bias_LYA"]:+.4f} -> '
          f'chi2 = {row["fval"]:.3f} (beta profiled to '
          f'{row["beta_LYA"]:.3f})')

best = min(results, key=lambda r: r['fval'])
print(f'profile minimum at bias = {best["bias_LYA"]:+.4f}')

# The same runs through the config surface: a [chi2 scan] section in
# main.ini makes run_vega call Analysis.chi2_scan (batched by default).
