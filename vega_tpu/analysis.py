"""Analysis driver: chi^2 scans and Monte-Carlo mock fits.

Counterpart of the reference's vega/analysis.py. The per-mock loop keeps
the reference's semantics (identical seeds/ordering); the batched,
vmapped Monte-Carlo engine that replaces the MPI rank fan-out lives in
vega_tpu.parallel.
"""

from __future__ import annotations

import sys

import numpy as np

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

    def chi2_scan(self):
        """1D/2D chi^2 scan, re-minimizing the other parameters at each
        grid point (reference: analysis.py:53-124)."""
        if 'chi2 scan' not in self.config:
            raise ValueError('Called chi2_scan, but no "[chi2 scan]" section '
                             'in main.ini.')

        self.grids = {}
        for param, value in self.config.items('chi2 scan'):
            start, end, num_points = value.split()
            self.grids[param] = np.linspace(float(start), float(end),
                                            int(num_points))

        dim = len(self.grids)
        if dim > 2:
            raise ValueError('chi2_scan only supports one/two parameter scans')

        sample_params = {'fix': {}, 'values': {}, 'errors': {}}
        for param in self.grids:
            sample_params['fix'][param] = True
            sample_params['errors'][param] = 0.

        # Default: all grid points minimized simultaneously on device
        # (exact-derivative batched Newton; tests pin agreement with the
        # serial re-minimization loop). `batched_scan = False` in
        # [control] restores the reference's serial MIGRAD-style loop.
        batched = self._vega is not None
        if self._vega is not None and 'control' in self.config:
            batched = self.config['control'].getboolean(
                'batched_scan', True)
        if batched:
            # all grid points minimized simultaneously on device
            from .parallel.batch import batched_chi2_scan
            self.scan_results = batched_chi2_scan(
                self._vega, self.grids,
                sample_params=self._vega.sample_params)
            return self.scan_results

        self.scan_results = []
        par1 = list(self.grids.keys())[0]
        if dim == 1:
            for i, value in enumerate(self.grids[par1]):
                sample_params['values'][par1] = value
                self._scan_minimizer.minimize(sample_params)
                result = self._scan_minimizer.values
                result['fval'] = self._scan_minimizer.fmin.fval
                self.scan_results.append(result)
                print(f'INFO: finished chi2scan iteration {i + 1} of '
                      f'{len(self.grids[par1])}')
        else:
            par2 = list(self.grids.keys())[1]
            for i, value_1 in enumerate(self.grids[par1]):
                for j, value_2 in enumerate(self.grids[par2]):
                    sample_params['values'][par1] = value_1
                    sample_params['values'][par2] = value_2
                    self._scan_minimizer.minimize(sample_params)
                    result = self._scan_minimizer.values
                    result['fval'] = self._scan_minimizer.fmin.fval
                    self.scan_results.append(result)
                    print('INFO: finished chi2scan iteration {} of {}'.format(
                        i * len(self.grids[par2]) + j + 1,
                        len(self.grids[par1]) * len(self.grids[par2])))
        return self.scan_results

    def create_monte_carlo_sim(self, fiducial_model, seed=None, scale=None,
                               forecast=False):
        """(reference: analysis.py:126-162)"""
        mocks = {}
        for name in self._corr_items:
            if scale is None:
                item_scale = self._corr_items[name].cov_rescale
            elif isinstance(scale, (float, int)):
                item_scale = scale
            elif isinstance(scale, dict) and name in scale:
                item_scale = scale[name]
            else:
                item_scale = 1.
            mocks[name] = self._data[name].create_monte_carlo(
                fiducial_model[name], item_scale, seed, forecast)
        return mocks

    def create_global_monte_carlo(self, fiducial_model, seed=None, scale=None,
                                  forecast=False):
        """(reference: analysis.py:164-222)"""
        assert self._global_cov is not None, (
            'create_global_monte_carlo requires a global covariance matrix.')

        if seed is not None:
            np.random.seed(seed)

        full_data_mask = np.concatenate(
            [self._data[name].data_mask for name in self._corr_items])

        if self._cholesky_global_cov is None:
            masked_cov = self._global_cov[np.ix_(full_data_mask,
                                                 full_data_mask)]
            if scale is None:
                scale = 1
            self._cholesky_global_cov = np.linalg.cholesky(scale * masked_cov)

        masked_fiducial = []
        for name, data in self._data.items():
            mask = data.dist_model_coordinates.get_mask_to_other(
                data.data_coordinates)
            if data.data_mask.size == fiducial_model[name].size:
                masked_fiducial.append(fiducial_model[name])
            elif mask.size == fiducial_model[name].size:
                masked_fiducial.append(fiducial_model[name][mask])
            else:
                raise ValueError('Input fiducial has unknown size. It must '
                                 'match the data or the model.')
        masked_fiducial = np.concatenate(masked_fiducial)

        if forecast:
            self.current_mc_mock = masked_fiducial[full_data_mask]
        else:
            ran_vec = np.random.randn(full_data_mask.sum())
            self.current_mc_mock = (masked_fiducial[full_data_mask]
                                    + self._cholesky_global_cov.dot(ran_vec))
        return self.current_mc_mock

    def run_monte_carlo(self, fiducial_model, num_mocks=1, seed=0, scale=None,
                        forecast=False, run_mc_fits=True):
        """Sequential mock loop (reference: analysis.py:224-308). For the
        batched TPU path see vega_tpu.parallel.MonteCarloEngine."""
        assert self.mc_config is not None, 'No Monte Carlo config provided'

        np.random.seed(seed)
        sample_params = self.mc_config['sample']
        minimizer = Minimizer(
            self._chi2_func, sample_params, grad_func=self._grad_func,
            hess_func=self._hess_func,
            valgrad_func=(self._vega.chi2_value_and_gradient
                          if self._vega is not None else None))

        self.mc_bestfits = {}
        self.mc_covariances = []
        self.mc_chisq = []
        self.mc_valid_minima = []
        self.mc_valid_hesse = []
        self.mc_mocks = {}
        self.mc_failed_mask = []

        for i in range(num_mocks):
            print(f'INFO: Running Monte Carlo realization {i}')
            sys.stdout.flush()

            if self._global_cov is None:
                mocks = self.create_monte_carlo_sim(
                    fiducial_model, seed=None, scale=scale, forecast=forecast)
                for name, cf_mock in mocks.items():
                    self.mc_mocks.setdefault(name, []).append(cf_mock)
            else:
                mocks = self.create_global_monte_carlo(
                    fiducial_model, seed=None, scale=scale, forecast=forecast)
                self.mc_mocks.setdefault('global', []).append(mocks)

            if not run_mc_fits:
                continue

            try:
                minimizer.minimize()
                self.mc_failed_mask.append(False)
            except ValueError:
                print(f'WARNING: Minimizer failed for mock {i}')
                self.mc_failed_mask.append(True)
                self.mc_chisq.append(np.nan)
                self.mc_valid_minima.append(False)
                self.mc_valid_hesse.append(False)
                continue

            for param, value in minimizer.values.items():
                self.mc_bestfits.setdefault(param, []).append(
                    [value, minimizer.errors[param]])

            self.mc_covariances.append(np.array(minimizer.covariance))
            self.mc_chisq.append(minimizer.fmin.fval)
            self.mc_valid_minima.append(minimizer.fmin.is_valid)
            self.mc_valid_hesse.append(not minimizer.fmin.hesse_failed)

        if run_mc_fits:
            for param in self.mc_bestfits:
                self.mc_bestfits[param] = np.array(self.mc_bestfits[param])

        self.has_monte_carlo = True
