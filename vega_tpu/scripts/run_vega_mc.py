#!/usr/bin/env python
"""Monte-Carlo mock driver.

Replaces the reference's MPI Monte-Carlo driver (bin/run_vega_mc_mpi.py):
the num_mc_mocks realizations are generated with jax.random keys and fit
in device-sharded batches (vega_tpu.parallel.MonteCarloEngine) instead of
being split over MPI ranks with seed = mc_seed + rank. A sequential mode
(--sequential) keeps the reference's exact loop semantics.
"""

import argparse
import sys

import numpy as np


def main(argv=None):
    pars = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description='Run Monte-Carlo mock fits in device-sharded batches.')
    pars.add_argument('config', type=str, help='Config file')
    pars.add_argument('--sequential', action='store_true',
                      help='Reference-style sequential mock loop')
    pars.add_argument('--n-devices', type=int, default=None)
    args = pars.parse_args(argv)

    from vega_tpu.vega_interface import VegaInterface
    from vega_tpu.parallel import MonteCarloEngine, make_device_mesh

    print('Initializing vega_tpu')
    vega = VegaInterface(args.config)

    run_montecarlo = vega.main_config['control'].getboolean(
        'run_montecarlo', False)
    if not run_montecarlo or (vega.mc_config is None):
        raise ValueError('Monte Carlo not requested. Add "run_montecarlo = '
                         'True" to the "[control]" section.')

    fiducial_model = vega.get_fiducial_for_monte_carlo()
    vega.monte_carlo = True

    forecast = vega.main_config['control'].getboolean('forecast', False)
    if forecast:
        raise ValueError('You asked to run a forecast. Use run_vega instead.')

    seed = vega.main_config['control'].getint('mc_seed', 0)
    num_mc_mocks = vega.main_config['control'].getint('num_mc_mocks', 1)
    run_mc_fits = vega.main_config['control'].getboolean('run_mc_fits', True)

    if args.sequential:
        vega.analysis.run_monte_carlo(
            fiducial_model, num_mocks=num_mc_mocks, seed=seed,
            forecast=forecast, run_mc_fits=run_mc_fits)
        vega.output.write_monte_carlo()
        return 0

    mesh = make_device_mesh(args.n_devices)
    engine = MonteCarloEngine(vega, mesh=mesh)
    mocks = engine.generate_mocks(fiducial_model, num_mc_mocks, seed=seed)

    if run_mc_fits:
        results = engine.fit_mocks(mocks)

        # Feed the results into the Analysis containers so the standard
        # Monte-Carlo output writer applies (reference: output.py:442-520)
        analysis = vega.analysis
        analysis.mc_bestfits = {
            name: np.stack([results['values'][:, i],
                            results['errors'][:, i]], axis=1)
            for i, name in enumerate(results['names'])
        }
        analysis.mc_covariances = list(results['covariances'])
        analysis.mc_chisq = list(results['chisq'])
        analysis.mc_valid_minima = list(results['valid'])
        analysis.mc_valid_hesse = list(np.isfinite(
            results['errors']).all(axis=1))
        analysis.mc_failed_mask = list(~np.asarray(results['valid']))
    else:
        vega.analysis.mc_bestfits = {}
        vega.analysis.mc_covariances = []
        vega.analysis.mc_chisq = []
        vega.analysis.mc_valid_minima = []
        vega.analysis.mc_valid_hesse = []
        vega.analysis.mc_failed_mask = []

    vega.analysis.mc_mocks = {name: list(np.asarray(m))
                              for name, m in mocks.items()}
    vega.analysis.has_monte_carlo = True
    vega.output.write_monte_carlo()
    return 0


if __name__ == '__main__':
    sys.exit(main())
