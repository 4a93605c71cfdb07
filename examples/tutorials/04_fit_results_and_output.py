"""Tutorial 4 — Output files and FitResults.

Counterpart of the reference's FitResultsTutorial.ipynb: run a fit
through the standard driver (which writes the FITS results file), read
it back with FitResults, and build a Gaussian-approximation chain.

Run:  python 04_fit_results_and_output.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import tempfile
from pathlib import Path

from vega_tpu.postprocess.fit_results import FitResults
from vega_tpu.scripts.run_vega import run_vega
from vega_tpu.testing import make_synthetic_dataset

workdir = Path(tempfile.mkdtemp(prefix='vega_tutorial_'))
main_path = make_synthetic_dataset(workdir, cross=False)

# The standard driver: minimize -> write FITS results (+ scans/plots
# when configured)
vega = run_vega(main_path)

out_file = Path(str(workdir / 'output') + '.fits')
print(f'\nresults file: {out_file}')

# --- Read everything back --------------------------------------------
results = FitResults(out_file)
print('bestfit parameters:', results.params)
print(f'chi2 = {results.chisq:.4f}, PTE = {results.p_value:.3f}')

corr = results.correlations['lyaxlya']
print(f'stored model: {corr.model.shape}, data: {corr.data.shape}')

# --- Gaussian-approximation chain (getdist when installed, internal
# fallback otherwise) -------------------------------------------------
chain = results.chain
for name in results.names:
    print(f'  {name}: mean {chain.mean(name):+.5f}, '
          f'std {chain.std(name):.5f}')
