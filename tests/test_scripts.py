"""Smoke tests for the CLI drivers on synthetic data."""

import matplotlib

matplotlib.use('Agg')

from pathlib import Path

import numpy as np
import pytest

from vega_tpu.testing import make_synthetic_dataset


@pytest.mark.slow
def test_run_vega_fit_driver(tmp_path):
    """Full fit driver: minimize, write FITS results + wedge/shell PNGs
    (reference: vega/scripts/run_vega.py)."""
    main_path = make_synthetic_dataset(tmp_path, cross=False, size='tiny',
                                       noise=1.0)
    from vega_tpu.scripts.run_vega import run_vega
    vega = run_vega(main_path)

    outfile = vega.output.outfile
    assert Path(outfile + '.fits').exists()
    name = next(iter(vega.corr_items))
    assert Path(f'{outfile[:-5]}_{name}_wedges.png'.replace(
        outfile[:-5], outfile)).exists() or list(tmp_path.glob('*.png'))


@pytest.mark.slow
def test_run_vega_mc_driver(tmp_path):
    """Batched Monte-Carlo driver writes the MC FITS output
    (reference: bin/run_vega_mc_mpi.py)."""
    control = ('run_montecarlo = True\nnum_mc_mocks = 4\nmc_seed = 1\n'
               'run_mc_fits = True')
    main_path = make_synthetic_dataset(
        tmp_path, cross=False, size='tiny', noise=1.0,
        extra_control=control)
    # add [monte carlo] + [mc parameters] sections
    text = main_path.read_text()
    text += ('\n[monte carlo]\nbias_LYA = True\nbeta_LYA = True\n'
             '\n[mc parameters]\nbias_LYA = -0.117\nbeta_LYA = 1.67\n')
    main_path.write_text(text)

    from vega_tpu.scripts.run_vega_mc import main as mc_main
    assert mc_main([str(main_path)]) == 0

    mc_file = tmp_path / 'monte_carlo' / 'monte_carlo.fits'
    assert mc_file.exists()

    from vega_tpu.io.fits import read_fits
    hdus = {h.name: h for h in read_fits(mc_file) if getattr(h, 'name', '')}
    assert 'BESTFIT' in {k.upper() for k in hdus}
    bestfit = hdus.get('Bestfit') or hdus.get('BESTFIT')
    values = np.asarray(bestfit['values'])
    assert values.shape[1] == 4  # 4 mocks
    assert np.isfinite(values).all()


@pytest.mark.slow
def test_nested_sampler_on_synthetic(tmp_path):
    """Native NS over the real (tiny) likelihood with batched evals."""
    import configparser

    from vega_tpu.parallel import BatchedLikelihood
    from vega_tpu.samplers.nested import NestedSampler
    from vega_tpu.vega_interface import VegaInterface

    main_path = make_synthetic_dataset(tmp_path, cross=False, size='tiny',
                                       noise=1.0)
    vega = VegaInterface(main_path)
    batched = BatchedLikelihood(vega)

    out_dir = tmp_path / 'sampler_out'
    out_dir.mkdir()
    config = configparser.ConfigParser()
    config.optionxform = lambda o: o
    config['s'] = {'path': str(out_dir), 'name': 'synth',
                   'num_live': '60', 'num_repeats': '6',
                   'precision': '0.05', 'resume': 'False',
                   'max_iters': '200'}
    sampler = NestedSampler(config['s'],
                            {'bias_LYA': (-0.3, -0.01),
                             'beta_LYA': (0.5, 3.0)},
                            batched.log_lik)
    results = sampler.run()
    assert np.isfinite(results['logz'])
    # Posterior mean lands near the truth (generous tolerance: few live pts)
    mean_bias = np.average(results['samples'][:, 0],
                           weights=results['weights'])
    assert mean_bias == pytest.approx(-0.117, abs=0.03)
