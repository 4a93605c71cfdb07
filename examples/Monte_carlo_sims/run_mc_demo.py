"""Monte-Carlo simulations — runnable demo + config reference.

Counterpart of the reference's examples/Monte_carlo_sims (README +
gen_mc/fit_mc config pairs for run_vega_mc_mpi.py). The MPI rank
fan-out becomes the device-batched engine here: all mocks are generated
(fiducial + Cholesky noise) and fitted simultaneously on the mesh.

Two ways to run MC campaigns:

1. Config-driven (reference-compatible): a main.ini with
   [control] run_montecarlo = True, num_mc_mocks = N, plus the
   [monte carlo] / [mc parameters] sections, run through
   `python -m vega_tpu.scripts.run_vega_mc main.ini` — sequential
   reference semantics (identical seeds/ordering), or the batched
   engine via the API below.

2. API-driven (this demo): MonteCarloEngine directly.

Run:  python run_mc_demo.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import tempfile

import numpy as np

from vega_tpu.parallel import MonteCarloEngine, make_device_mesh
from vega_tpu.testing import make_synthetic_dataset
from vega_tpu.vega_interface import VegaInterface

NUM_MOCKS = 32

workdir = tempfile.mkdtemp(prefix='vega_mc_demo_')
vega = VegaInterface(make_synthetic_dataset(workdir, cross=True,
                                            size='tiny'))

# The fiducial: the model at the parameters mocks should be drawn from
# (the reference reads these from [mc parameters] / a saved fit;
# vega.get_fiducial_for_monte_carlo does the same here)
fiducial = vega.compute_model(run_init=False)

vega.monte_carlo = True
engine = MonteCarloEngine(vega, mesh=make_device_mesh())

# Generate ALL mocks on device: fiducial + L @ N(0,1) per realization
mocks = engine.generate_mocks(fiducial, num_mocks=NUM_MOCKS, seed=42)

# Fit ALL mocks simultaneously (batched damped-Newton, exact
# gradients/Hessians, sharded over the mesh)
results = engine.fit_mocks(mocks, sample_params=vega.sample_params,
                           max_iterations=100)

valid = results['valid']
print(f'{int(valid.sum())}/{NUM_MOCKS} valid fits')
for i, name in enumerate(results['names']):
    vals = results['values'][valid, i]
    errs = results['errors'][valid, i]
    truth = vega.params[name]
    pulls = (vals - truth) / errs
    print(f'{name}: ensemble mean {vals.mean():+.5f} (truth {truth:+.5f}),'
          f' pull mean {pulls.mean():+.2f}, pull std {pulls.std():.2f}')

# Pull distribution ~ N(0, 1) validates both the mock generation and
# the error bars from the batched Hessians.
assert abs(np.mean((results['values'][valid] -
                    [vega.params[n] for n in results['names']])
                   / results['errors'][valid])) < 0.5
print('MC demo OK')
