"""Tutorial 3 — Wedges, shells and plotting.

Counterpart of the reference's Plots_tutorial / VegaPlots notebooks:
mu-wedge compression of the 2D correlation (with covariance
propagation), angular shells, and the VegaPlots panel helpers.

Run:  python 03_plots.py    (writes PNGs next to the data)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import tempfile
from pathlib import Path

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt          # noqa: E402

from vega_tpu.plots.wedges import Wedge  # noqa: E402
from vega_tpu.testing import make_synthetic_dataset   # noqa: E402
from vega_tpu.vega_interface import VegaInterface     # noqa: E402

workdir = Path(tempfile.mkdtemp(prefix='vega_tutorial_'))
vega = VegaInterface(make_synthetic_dataset(workdir, cross=False))
vega.minimize()
model = vega.compute_model(vega.bestfit.values, run_init=False)

# --- Low-level: one mu-wedge as a weight matrix ----------------------
data = vega.data['lyaxlya']
wedge = Wedge(mu=(0.5, 1.0), rp=(0., 200., 50), rt=(0., 200., 50),
              r=(10., 180., 43))
r, xi_w, cov_w = wedge(data.data_vec, data.cov_mat)
r_m, xi_m, _ = wedge(model['lyaxlya'], data.cov_mat)

fig, ax = plt.subplots(figsize=(6, 4))
ax.errorbar(r, xi_w * r ** 2, yerr=r ** 2 * cov_w.diagonal() ** 0.5,
            fmt='.', label='data')
ax.plot(r_m, xi_m * r_m ** 2, label='best-fit model')
ax.set_xlabel(r'$r\,[h^{-1}\,{\rm Mpc}]$')
ax.set_ylabel(r'$r^2 \xi(r)$')
ax.legend()
fig.savefig(workdir / 'wedge.png', dpi=120)
print(f'wrote {workdir / "wedge.png"}')

# --- High-level: VegaPlots panels ------------------------------------
plots = vega.plots                        # built from the fit data
plots.plot_4wedges(models=[model['lyaxlya']], corr_name='lyaxlya',
                   labels=['best fit'])
plt.savefig(workdir / 'four_wedges.png', dpi=120)
print(f'wrote {workdir / "four_wedges.png"}')
