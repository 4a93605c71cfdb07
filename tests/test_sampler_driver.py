"""Sampler and mock-refit CLI drivers on synthetic data."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from vega_tpu.testing import make_synthetic_dataset


def test_run_vega_sampler_nested(tmp_path):
    """run_vega_sampler with the native nested sampler
    (replaces bin/run_vega_mpi.py)."""
    out_dir = tmp_path / 'output_sampler'
    out_dir.mkdir()
    main_path = make_synthetic_dataset(
        tmp_path, cross=False, size='tiny', noise=1.0)
    # enable the sampler after dataset generation (the factory itself
    # instantiates an interface, which requires the sampler section)
    text = main_path.read_text().replace(
        '[control]\n', '[control]\nrun_sampler = True\nsampler = NestedJax\n')
    text += (f'\n[NestedJax]\npath = {out_dir}\nname = synth\n'
             'num_live = 50\nnum_repeats = 5\nprecision = 0.1\n'
             'resume = False\nmax_iters = 150\n')
    main_path.write_text(text)

    from vega_tpu.scripts.run_vega_sampler import main as sampler_main
    assert sampler_main([str(main_path)]) == 0
    assert (out_dir / 'synth.txt').exists()
    assert (out_dir / 'synth.paramnames').exists()
    chain = np.loadtxt(out_dir / 'synth.txt')
    assert chain.shape[1] == 4  # weight, -2lnL, 2 params
    assert np.isfinite(chain).all()


def test_run_vega_sampler_hmc(tmp_path):
    """run_vega_sampler with the native exact-gradient HMC sampler."""
    out_dir = tmp_path / 'output_sampler'
    out_dir.mkdir()
    main_path = make_synthetic_dataset(
        tmp_path, cross=False, size='tiny', noise=1.0)
    text = main_path.read_text().replace(
        '[control]\n', '[control]\nrun_sampler = True\nsampler = HMC\n')
    text += (f'\n[HMC]\npath = {out_dir}\nname = synth_hmc\n'
             'num_chains = 8\nnum_samples = 60\nnum_warmup = 60\n'
             'num_leapfrog = 8\nseed = 3\n')
    main_path.write_text(text)

    from vega_tpu.scripts.run_vega_sampler import main as sampler_main
    assert sampler_main([str(main_path)]) == 0
    assert (out_dir / 'synth_hmc.txt').exists()
    assert (out_dir / 'synth_hmc.paramnames').exists()
    chain = np.loadtxt(out_dir / 'synth_hmc.txt')
    assert chain.shape == (8 * 60, 4)  # weight, -2lnL, 2 params
    assert np.isfinite(chain).all()


def test_run_vega_mc_fits(tmp_path):
    """Saved-mock re-fits (replaces bin/run_vega_mc_fits_mpi.py)."""
    control = ('run_montecarlo = True\nnum_mc_mocks = 3\nmc_seed = 2\n'
               'run_mc_fits = False')
    main_path = make_synthetic_dataset(
        tmp_path, cross=False, size='tiny', noise=1.0,
        extra_control=control)
    text = main_path.read_text()
    text += ('\n[monte carlo]\nbias_LYA = True\nbeta_LYA = True\n'
             '\n[mc parameters]\nbias_LYA = -0.117\nbeta_LYA = 1.67\n')
    main_path.write_text(text)

    # Generate + save mocks without fitting
    from vega_tpu.scripts.run_vega_mc import main as mc_main
    assert mc_main([str(main_path)]) == 0
    mock_file = tmp_path / 'monte_carlo' / 'monte_carlo.fits'
    assert mock_file.exists()

    # Re-fit the saved mocks
    text = main_path.read_text().replace(
        'run_mc_fits = False', f'run_mc_fits = True\nmc_mocks = {mock_file}')
    main_path.write_text(text)

    from vega_tpu.scripts.run_vega_mc_fits import main as refit_main
    assert refit_main([str(main_path)]) == 0

    from vega_tpu.io.fits import read_fits
    hdus = {h.name: h for h in read_fits(mock_file)
            if getattr(h, 'name', '')}
    bestfit = hdus.get('Bestfit')
    assert bestfit is not None
    values = np.asarray(bestfit['values'])
    assert values.shape[1] == 3
    # fits should land near the truth
    names = list(bestfit['names'])
    bias_row = names.index('bias_LYA')
    assert np.all(np.abs(values[bias_row] + 0.117) < 0.02)
