#!/usr/bin/env python
"""Re-fit saved Monte-Carlo mocks.

Replaces the reference's MPI re-fit driver (bin/run_vega_mc_fits_mpi.py):
the saved mock table is fit in one device-sharded batch instead of being
block-distributed over MPI ranks.
"""

import argparse
import sys

import numpy as np


def main(argv=None):
    pars = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description='Re-fit saved Monte-Carlo mocks in a sharded batch.')
    pars.add_argument('config', type=str, help='Config file')
    pars.add_argument('--n-devices', type=int, default=None)
    args = pars.parse_args(argv)

    from vega_tpu.io.fits import read_fits
    from vega_tpu.parallel import MonteCarloEngine, make_device_mesh
    from vega_tpu.utils import find_file
    from vega_tpu.vega_interface import VegaInterface

    print('Initializing vega_tpu')
    vega = VegaInterface(args.config)
    control = vega.main_config['control']

    use_distortion = control.getboolean('use_distortion', True)
    if not use_distortion:
        for data in vega.data.values():
            data._distortion_mat = None
        _ = vega.compute_model(vega.params, run_init=True)

    run_montecarlo = control.getboolean('run_montecarlo', False)
    if not run_montecarlo or (vega.mc_config is None):
        raise ValueError('Monte Carlo not requested. Add "run_montecarlo = '
                         'True" to the "[control]" section.')

    vega.monte_carlo = True

    mock_path = control.get('mc_mocks')
    hdul = read_fits(find_file(mock_path))
    mocks_table = None
    for hdu in hdul:
        if getattr(hdu, 'name', '').upper() == 'MOCKS':
            mocks_table = hdu
    assert mocks_table is not None, 'No MOCKS HDU in the mock file'

    # Optional slicing of the saved global vectors
    # (reference: bin/run_vega_mc_fits_mpi.py:141-152)
    slices = [control.getint(f'slice_{key}', None)
              for key in ('start1', 'end1', 'start2', 'end2')]

    if 'global' in mocks_table.columns:
        global_mocks = np.atleast_2d(mocks_table['global'])
        if all(s is not None for s in slices):
            s1, e1, s2, e2 = slices
            global_mocks = np.concatenate(
                [global_mocks[:, s1:e1], global_mocks[:, s2:e2]], axis=1)
        # Split the global vector back into per-correlation masked chunks
        mocks = {}
        offset = 0
        for name in vega.corr_items:
            size = vega.data[name].data_size
            mocks[name] = global_mocks[:, offset:offset + size]
            offset += size
    else:
        mocks = {name: np.atleast_2d(mocks_table[name])
                 for name in vega.corr_items}
        # Saved per-correlation mocks are full-grid; mask them
        for name in vega.corr_items:
            mask = vega.data[name].data_mask
            if mocks[name].shape[1] == mask.size:
                mocks[name] = mocks[name][:, mask]

    mesh = make_device_mesh(args.n_devices)
    engine = MonteCarloEngine(vega, mesh=mesh)
    results = engine.fit_mocks(mocks)

    analysis = vega.analysis
    analysis.mc_bestfits = {
        name: np.stack([results['values'][:, i], results['errors'][:, i]],
                       axis=1)
        for i, name in enumerate(results['names'])
    }
    analysis.mc_covariances = list(results['covariances'])
    analysis.mc_chisq = list(results['chisq'])
    analysis.mc_valid_minima = list(results['valid'])
    analysis.mc_valid_hesse = list(np.isfinite(
        results['errors']).all(axis=1))
    analysis.mc_failed_mask = list(~np.asarray(results['valid']))
    analysis.mc_mocks = {name: list(np.asarray(m))
                         for name, m in mocks.items()}
    analysis.has_monte_carlo = True
    vega.output.write_monte_carlo()
    return 0


if __name__ == '__main__':
    sys.exit(main())
