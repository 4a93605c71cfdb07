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
