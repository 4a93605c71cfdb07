#!/usr/bin/env python
"""Sampler driver.

Replaces the reference's MPI sampler driver (bin/run_vega_mpi.py): one
controller process drives batched, device-sharded likelihood evaluations
instead of MPI ranks each holding a full replica. The staggered-init
machinery (--init-limit) disappears — there is exactly one host replica.
"""

import argparse
import sys


def main(argv=None):
    pars = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description='Run the sampler with device-batched likelihoods.')
    pars.add_argument('config', type=str, help='Config file')
    pars.add_argument('--n-devices', type=int, default=None,
                      help='Limit the number of devices in the mesh')
    args = pars.parse_args(argv)

    from vega_tpu.vega_interface import VegaInterface
    from vega_tpu.parallel import BatchedLikelihood, make_device_mesh

    print('Initializing vega_tpu')
    vega = VegaInterface(args.config)
    sampling_params = vega.sample_params['limits']

    run_montecarlo = vega.main_config['control'].getboolean(
        'run_montecarlo', False)
    if run_montecarlo and vega.mc_config is not None:
        _ = vega.initialize_monte_carlo()
        sampling_params = vega.mc_config['sample']['limits']
    elif run_montecarlo:
        raise ValueError('You asked to run over a Monte Carlo simulation, '
                         'but no "[monte carlo]" section provided.')

    if not vega.run_sampler:
        raise ValueError('Sampler not requested. Add "run_sampler = True" '
                         'to the "[control]" section.')

    mesh = make_device_mesh(args.n_devices)
    batched = BatchedLikelihood(vega, mesh=mesh)

    if vega.sampler == 'Polychord':
        from vega_tpu.samplers.polychord import Polychord, HAS_POLYCHORD

        print('Running Polychord' if HAS_POLYCHORD
              else 'Running native nested sampler (Polychord settings)')
        # the native fallback accepts the BatchedLikelihood itself and
        # fuses the per-iteration evolution on device (nested.py)
        log_lik = vega.log_lik if HAS_POLYCHORD else batched
        sampler = Polychord(vega.main_config['Polychord'], sampling_params,
                            log_lik, vega.corr_num_marg_modes)
        sampler.run()

    elif vega.sampler == 'PocoMC':
        from vega_tpu.samplers.pocomc import PocoMC, HAS_POCOMC

        print('Running PocoMC' if HAS_POCOMC
              else 'Running native SMC sampler (PocoMC settings)')
        sampler = PocoMC(vega.main_config['PocoMC'], sampling_params,
                         batched.log_lik)
        sampler.run()

    elif vega.sampler == 'NestedJax':
        from vega_tpu.samplers.nested import NestedSampler

        print('Running native nested sampler')
        sampler = NestedSampler(vega.main_config['NestedJax'],
                                sampling_params, batched,
                                vega.corr_num_marg_modes)
        sampler.run()

    elif vega.sampler == 'HMC':
        from vega_tpu.samplers.hmc import HMC

        print('Running native exact-gradient HMC sampler')
        sampler = HMC(vega.main_config['HMC'], sampling_params, batched)
        sampler.run()
    else:
        raise ValueError(f'Unknown sampler {vega.sampler}')

    print('Finished running sampler')
    return 0


if __name__ == '__main__':
    sys.exit(main())
