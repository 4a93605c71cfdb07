"""Two-process multi-host (DCN) test of the distributed batched
likelihood (VERDICT item: multi-host path had no test).

Two OS processes each get 4 virtual CPU devices and wire up through
jax.distributed.initialize (the DCN coordinator path, replacing the
reference's mpirun fan-out, bin/run_vega_mpi.py:35-49). Both run the
same SPMD program: an 8-device global mesh, one sharded batched-chi^2
call. Process 0 checks the gathered values against the serial eager
evaluation.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

WORKER = r'''
import os, sys
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np

from vega_tpu.parallel.distributed import initialize, global_mesh
from vega_tpu.parallel import BatchedLikelihood
from vega_tpu.testing import make_synthetic_dataset
from vega_tpu.vega_interface import VegaInterface

pid = int(sys.argv[1])
coord = sys.argv[2]
workdir = sys.argv[3]

jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 8, len(jax.devices())

# identical deterministic dataset on both hosts (same seed)
main_path = make_synthetic_dataset(os.path.join(workdir, str(pid)),
                                   cross=False, size='tiny', seed=0)
vega = VegaInterface(main_path)

mesh = global_mesh()
bl = BatchedLikelihood(vega, mesh=mesh)
batch = {
    'bias_LYA': -0.117 + 0.002 * np.arange(16),
    'beta_LYA': 1.67 + 0.01 * np.arange(16),
}
chi2 = bl.chi2(batch)

if pid == 0:
    serial = [vega.chi2({k: float(v[i]) for k, v in batch.items()})
              for i in (0, 7, 15)]
    for idx, s in zip((0, 7, 15), serial):
        assert abs(chi2[idx] - s) <= 1e-9 * max(1.0, abs(s)), (
            idx, chi2[idx], s)
    print('DCN-OK', chi2[0], chi2[15])
'''


def test_two_process_dcn_batched_likelihood(tmp_path):
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    coord = f'localhost:{port}'

    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    env['PYTHONPATH'] = str(Path(__file__).resolve().parents[1])
    env.pop('VEGA_TPU_DRYRUN_CHILD', None)

    procs = [
        subprocess.Popen(
            [sys.executable, '-c', WORKER, str(pid), coord, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=500)[0] for p in procs]
    for pid, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, f'process {pid} failed:\n{out[-4000:]}'
    assert 'DCN-OK' in outs[0]
