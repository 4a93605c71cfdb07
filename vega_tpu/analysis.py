"""Analysis driver: chi^2 scans and Monte-Carlo mock fits.

Counterpart of the reference's vega/analysis.py (chi2_scan :53-124, MC
:126-308), re-shaped around two ideas:

- scans and mock fits are BATCHES by default — every grid point / mock
  becomes one element of a device-sharded exact-derivative Newton
  optimization (vega_tpu.parallel); the serial loops here exist for
  reference-semantics compatibility (identical seeds and ordering) and
  as the cross-check the batched tests pin against;
- mock generation itself lives in one place (vega_tpu/mocks.py), shared
  with the per-correlation Data path and the batched engine.
"""

from __future__ import annotations

import itertools
import sys

import numpy as np

from . import mocks
from .minimizer import Minimizer


class Analysis:
    """(reference: analysis.py:8-51)"""

    current_mc_mock = None

    def __init__(self, chi2_func, sampler_params, main_config, corr_items,
                 data, mc_config=None, global_cov=None, grad_func=None,
                 hess_func=None, vega=None):
        self.config = main_config
        self._vega = vega
        self._chi2_func = chi2_func
        self._grad_func = grad_func
        self._hess_func = hess_func
        self._scan_minimizer = Minimizer(
            chi2_func, sampler_params, grad_func=grad_func,
            hess_func=hess_func,
            valgrad_func=(vega.chi2_value_and_gradient
                          if vega is not None else None))
        self._corr_items = corr_items
        self._data = data
        self.mc_config = mc_config
        self.has_monte_carlo = False
        self._global_cov = global_cov
        self._cholesky_global_cov = None

    # ------------------------------------------------------------------
    # chi^2 scans
    # ------------------------------------------------------------------
    def _read_scan_grids(self):
        if 'chi2 scan' not in self.config:
            raise ValueError('Called chi2_scan, but no "[chi2 scan]" section '
                             'in main.ini.')
        grids = {}
        for param, value in self.config.items('chi2 scan'):
            start, end, num_points = value.split()
            grids[param] = np.linspace(float(start), float(end),
                                       int(num_points))
        if not 1 <= len(grids) <= 2:
            raise ValueError('chi2_scan only supports one/two parameter scans')
        return grids

    def _use_batched_scan(self):
        if self._vega is None:
            return False
        if 'control' in self.config:
            return self.config['control'].getboolean('batched_scan', True)
        return True

    def chi2_scan(self):
        """1D/2D profile scan, re-minimizing the free parameters at each
        grid point (reference: analysis.py:53-124).

        Default: every grid point is one element of a single batched
        exact-derivative Newton optimization on device. The serial
        re-minimization loop (`batched_scan = False`) matches the
        reference's behavior point for point.
        """
        self.grids = self._read_scan_grids()

        if self._use_batched_scan():
            from .parallel.batch import batched_chi2_scan
            self.scan_results = batched_chi2_scan(
                self._vega, self.grids,
                sample_params=self._vega.sample_params)
            return self.scan_results

        scan_names = list(self.grids)
        overrides = {'fix': {p: True for p in scan_names},
                     'errors': {p: 0. for p in scan_names},
                     'values': {}}
        points = list(itertools.product(*(self.grids[p]
                                          for p in scan_names)))
        self.scan_results = []
        for i, point in enumerate(points):
            overrides['values'] = dict(zip(scan_names, point))
            self._scan_minimizer.minimize(overrides)
            row = self._scan_minimizer.values
            row['fval'] = self._scan_minimizer.fmin.fval
            self.scan_results.append(row)
            print(f'INFO: finished chi2scan iteration {i + 1} of '
                  f'{len(points)}')
        return self.scan_results

    # ------------------------------------------------------------------
    # Mock generation (host-side; the device-batched generator lives in
    # parallel.MonteCarloEngine)
    # ------------------------------------------------------------------
    def create_monte_carlo_sim(self, fiducial_model, seed=None, scale=None,
                               forecast=False):
        """Per-correlation mocks (reference: analysis.py:126-162)."""
        return {
            name: self._data[name].create_monte_carlo(
                fiducial_model[name],
                mocks.resolve_scale(scale, self._corr_items[name], name),
                seed, forecast)
            for name in self._corr_items
        }

    def _global_mock_pieces(self, fiducial_model):
        """(joint data mask, fiducial concatenated on the joint grid)."""
        data_mask = np.concatenate([self._data[name].data_mask
                                    for name in self._corr_items])
        fiducial = np.concatenate(
            [mocks.match_to_data_grid(fiducial_model[name],
                                      self._data[name])
             for name in self._corr_items])
        return data_mask, fiducial

    def create_global_monte_carlo(self, fiducial_model, seed=None,
                                  scale=None, forecast=False):
        """One mock of the JOINT data vector from the global covariance
        (reference: analysis.py:164-222)."""
        assert self._global_cov is not None, (
            'create_global_monte_carlo requires a global covariance matrix.')
        if seed is not None:
            np.random.seed(seed)

        data_mask, fiducial = self._global_mock_pieces(fiducial_model)
        if forecast:
            self.current_mc_mock = fiducial[data_mask]
            return self.current_mc_mock

        if self._cholesky_global_cov is None:
            self._cholesky_global_cov = mocks.scaled_cholesky(
                self._global_cov, 1 if scale is None else scale,
                mask=data_mask)
        self.current_mc_mock = mocks.gaussian_draw(
            fiducial[data_mask], self._cholesky_global_cov)
        return self.current_mc_mock

    # ------------------------------------------------------------------
    # Serial Monte-Carlo loop
    # ------------------------------------------------------------------
    def _record_mock(self, mock):
        if self._global_cov is None:
            for name, cf_mock in mock.items():
                self.mc_mocks.setdefault(name, []).append(cf_mock)
        else:
            self.mc_mocks.setdefault('global', []).append(mock)

    def _fit_one_mock(self, minimizer, index):
        """Fit the current mock; returns a result record (None marks a
        failed fit — the reference's mc_failed_mask semantics,
        analysis.py:282-292)."""
        try:
            minimizer.minimize()
        except ValueError:
            print(f'WARNING: Minimizer failed for mock {index}')
            return None
        return {
            'values': minimizer.values,
            'errors': minimizer.errors,
            'cov': np.array(minimizer.covariance),
            'chisq': minimizer.fmin.fval,
            'valid': minimizer.fmin.is_valid,
            'hesse_ok': not minimizer.fmin.hesse_failed,
        }

    def run_monte_carlo(self, fiducial_model, num_mocks=1, seed=0,
                        scale=None, forecast=False, run_mc_fits=True):
        """Sequential generate-and-fit loop (reference: analysis.py:224-308
        — there it IS the MC engine, fanned out over MPI ranks; here the
        batched path is parallel.MonteCarloEngine and this loop serves
        reference-seed reproducibility)."""
        assert self.mc_config is not None, 'No Monte Carlo config provided'

        np.random.seed(seed)
        minimizer = Minimizer(
            self._chi2_func, self.mc_config['sample'],
            grad_func=self._grad_func, hess_func=self._hess_func,
            valgrad_func=(self._vega.chi2_value_and_gradient
                          if self._vega is not None else None))

        self.mc_mocks = {}
        records = []
        for i in range(num_mocks):
            print(f'INFO: Running Monte Carlo realization {i}')
            sys.stdout.flush()

            generate = (self.create_monte_carlo_sim
                        if self._global_cov is None
                        else self.create_global_monte_carlo)
            self._record_mock(generate(fiducial_model, seed=None,
                                       scale=scale, forecast=forecast))
            if run_mc_fits:
                records.append(self._fit_one_mock(minimizer, i))

        # Assemble the result arrays (same attribute surface the output
        # writer and the batched path fill: output.py write_monte_carlo)
        self.mc_bestfits = {}
        self.mc_covariances = []
        self.mc_chisq = []
        self.mc_valid_minima = []
        self.mc_valid_hesse = []
        self.mc_failed_mask = []
        for rec in records:
            self.mc_failed_mask.append(rec is None)
            if rec is None:
                self.mc_chisq.append(np.nan)
                self.mc_valid_minima.append(False)
                self.mc_valid_hesse.append(False)
                continue
            for param, value in rec['values'].items():
                self.mc_bestfits.setdefault(param, []).append(
                    [value, rec['errors'][param]])
            self.mc_covariances.append(rec['cov'])
            self.mc_chisq.append(rec['chisq'])
            self.mc_valid_minima.append(rec['valid'])
            self.mc_valid_hesse.append(rec['hesse_ok'])
        if run_mc_fits:
            self.mc_bestfits = {param: np.array(vals)
                                for param, vals in self.mc_bestfits.items()}

        self.has_monte_carlo = True
