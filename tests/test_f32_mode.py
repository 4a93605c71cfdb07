"""The f32 throughput mode (VEGA_TPU_X64=0) runs the full pipeline and
stays close to the f64 result. Runs in a subprocess because the x64
switch is process-global."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

from vega_tpu.testing import make_synthetic_dataset
from vega_tpu.vega_interface import VegaInterface

SCRIPT = r"""
import json, os, sys
os.environ['VEGA_TPU_X64'] = '0'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)
from vega_tpu.vega_interface import VegaInterface
vega = VegaInterface(sys.argv[1])
chi2 = vega.chi2({'bias_LYA': -0.117, 'beta_LYA': 1.67})
print(json.dumps({'chi2': float(chi2)}))
"""


def test_f32_pipeline_close_to_f64(tmp_path):
    main_path = make_synthetic_dataset(tmp_path, cross=True, size='tiny',
                                       noise=1.0)
    vega = VegaInterface(main_path)
    chi2_f64 = vega.chi2({'bias_LYA': -0.117, 'beta_LYA': 1.67})

    env = dict(os.environ)
    env['PYTHONPATH'] = str(Path(__file__).parents[1]) + os.pathsep + \
        env.get('PYTHONPATH', '')
    result = subprocess.run(
        [sys.executable, '-c', SCRIPT, str(main_path)],
        capture_output=True, text=True, env=env, timeout=300)
    assert result.returncode == 0, result.stderr[-2000:]
    chi2_f32 = json.loads(result.stdout.strip().splitlines()[-1])['chi2']

    # f32 model error ~1e-6 relative -> chi2 agreement at the 1e-2 level
    # on a chi2 of O(n_data)
    assert chi2_f32 == pytest.approx(chi2_f64, rel=1e-2)


GRID_SCRIPT = r"""
import json, os, sys
os.environ['VEGA_TPU_X64'] = '0'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)
from vega_tpu.vega_interface import VegaInterface
vega = VegaInterface(sys.argv[1])
pts = json.loads(sys.argv[2])
chi2 = [float(vega.chi2(p)) for p in pts]
payload = vega.get_collapsed(tuple(sorted(pts[0])))
print(json.dumps({'chi2': chi2,
                  'grid': payload.get('__grid__') is not None}))
"""


@pytest.mark.slow
def test_f32_grid_collapse_chi2_noise(tmp_path):
    """Certify the f32 throughput mode on the GRID-COLLAPSE path — the
    BAO regime every sampler actually runs in (docs/performance.md
    "Accuracy ladder"). The whole f32 pipeline is exercised end to end:
    the Chebyshev node sweep, the error-budgeted truncation/SVD and the
    per-eval contraction all run at f32 in the subprocess (the payload
    fingerprint separates x64 modes, so nothing is reused from the f64
    build). Measured on this config: max |delta chi2| ~ 2.7e-2 over
    points spanning the sampling box at chi2 up to ~3.3e3 — Δχ² noise
    two orders of magnitude below statistical significance (≪ 1), so
    f32 is safe for sampler/Monte-Carlo work in the BAO regime too."""
    sample = {'ap': 'True', 'at': 'True',
              'bias_LYA': 'True', 'beta_LYA': 'True'}
    main_path = make_synthetic_dataset(tmp_path, cross=True, sample=sample,
                                       noise=1.0, size='tiny')
    vega = VegaInterface(main_path)
    assert vega.get_collapsed(
        ('ap', 'at', 'bias_LYA', 'beta_LYA')).get('__grid__') is not None

    import numpy as np
    rng = np.random.default_rng(3)
    pts = [{'ap': 1.0 + rng.uniform(-0.08, 0.08),
            'at': 1.0 + rng.uniform(-0.08, 0.08),
            'bias_LYA': -0.117 * (1 + 0.05 * rng.normal()),
            'beta_LYA': 1.67 * (1 + 0.05 * rng.normal())}
           for _ in range(40)]
    chi2_f64 = np.array([float(vega.chi2(p)) for p in pts])

    env = dict(os.environ)
    env['PYTHONPATH'] = str(Path(__file__).parents[1]) + os.pathsep + \
        env.get('PYTHONPATH', '')
    result = subprocess.run(
        [sys.executable, '-c', GRID_SCRIPT, str(main_path),
         json.dumps(pts)],
        capture_output=True, text=True, env=env, timeout=600)
    assert result.returncode == 0, result.stderr[-2000:]
    out = json.loads(result.stdout.strip().splitlines()[-1])
    assert out['grid'], 'f32 subprocess did not build a grid payload'
    chi2_f32 = np.array(out['chi2'])

    diff = np.abs(chi2_f32 - chi2_f64)
    assert diff.max() < 0.3, \
        f'f32 grid-path chi2 noise too large: {diff.max():.3g}'
    assert (diff / np.abs(chi2_f64)).max() < 3e-4
