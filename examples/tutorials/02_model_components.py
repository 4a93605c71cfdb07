"""Tutorial 2 — Inside the model: components, Pk/Xi saving, direct Pk.

Counterpart of the reference's SimpleModelTutorial.ipynb: evaluate the
model with component saving on (peak/smooth decomposition, per-stage
Pk and xi), and run a direct full-Pk model.

Run:  python 02_model_components.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import tempfile

import numpy as np

from vega_tpu.testing import make_synthetic_dataset
from vega_tpu.vega_interface import VegaInterface

workdir = tempfile.mkdtemp(prefix='vega_tutorial_')
main_path = make_synthetic_dataset(workdir, cross=False)

vega = VegaInterface(main_path)

# --- Component saving: set save-components before building models ----
vega.fiducial['save-components'] = True
vega.compute_model(run_init=True)          # rebuild with saving enabled

model = vega.models['lyaxlya']
print('saved Pk stages:', sorted(model.pk['peak'].keys()))
print('saved xi stages:', sorted(model.xi['smooth'].keys()))
pk_peak = model.pk['peak']['core']
print(f'peak-component P(k, mu_k) grid: {pk_peak.shape}, '
      f'mean {pk_peak.mean():.4f}')
xi_dist = model.xi_distorted['smooth']['core']
print(f'distorted smooth xi: {xi_dist.shape}, mean {xi_dist.mean():.3e}')

# The full model is bao_amp * peak + smooth at the xi level
full = vega.compute_model(run_init=False)['lyaxlya']
recon = (vega.params['bao_amp'] * model.xi_distorted['peak']['core']
         + model.xi_distorted['smooth']['core'])
print('peak+smooth == full:', np.allclose(recon, full))

# --- Direct Pk: hand the model an arbitrary linear P(k) --------------
pk_custom = np.asarray(vega.fiducial['pk_full']) * 1.05
direct = vega.compute_model(run_init=False, direct_pk=pk_custom)
print(f'direct-Pk model mean: {direct["lyaxlya"].mean():.3e}')
