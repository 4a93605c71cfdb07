"""Output writer -> FitResults reader roundtrip on a synthetic fit."""

import numpy as np
import pytest

from vega_tpu.testing import make_synthetic_dataset
from vega_tpu.vega_interface import VegaInterface


@pytest.fixture(scope='module')
def fitted_vega(tmp_path_factory):
    workdir = tmp_path_factory.mktemp('fit')
    main_path = make_synthetic_dataset(workdir, cross=False, size='tiny',
                                       noise=1.0)
    vega = VegaInterface(main_path)
    vega.minimize()
    vega.output.write_results(vega.bestfit_model, vega.params,
                              vega.minimizer, vega.bestfit_corr_stats)
    return vega


def test_write_and_read_results(fitted_vega):
    vega = fitted_vega
    from vega_tpu.postprocess.fit_results import FitResults
    outfile = vega.output.outfile
    if not outfile.endswith('.fits'):
        outfile += '.fits'
    results = FitResults(outfile, no_chain=True)

    assert results.chisq == pytest.approx(vega.minimizer.fmin.fval)
    for name in vega.minimizer.values:
        assert results.params[name] == pytest.approx(
            vega.minimizer.values[name])
        assert results.sigmas[name] == pytest.approx(
            vega.minimizer.errors[name])
    np.testing.assert_allclose(results.cov,
                               np.array(vega.minimizer.covariance))

    corr = next(iter(results.correlations.values()))
    name = next(iter(vega.corr_items))
    np.testing.assert_allclose(corr.model, vega.bestfit_model[name])
    np.testing.assert_allclose(corr.data, vega.data[name].data_vec)


def test_gaussian_chain(fitted_vega):
    from vega_tpu.postprocess.fit_results import FitResults
    outfile = fitted_vega.output.outfile
    if not outfile.endswith('.fits'):
        outfile += '.fits'
    results = FitResults(outfile)
    names = list(results.params.keys())
    chain = results.chain
    assert chain.samples.shape[1] == len(names)
    # Gaussian draws reproduce the written mean/covariance
    sample_std = chain.samples.std(axis=0)
    np.testing.assert_allclose(
        chain.samples.mean(axis=0), results.mean,
        atol=5 * np.max(sample_std) / np.sqrt(len(chain.samples)) + 1e-12)
    np.testing.assert_allclose(
        sample_std ** 2, np.diag(results.cov), rtol=0.1)


def test_scan_hdu(fitted_vega, tmp_path):
    vega = fitted_vega
    vega.main_config.add_section('chi2 scan')
    vega.main_config['chi2 scan']['bias_LYA'] = '-0.125 -0.11 3'
    scan_results = vega.analysis.chi2_scan()
    vega.output.outfile = str(tmp_path / 'with_scan.fits')
    vega.output.write_results(vega.bestfit_model, vega.params,
                              vega.minimizer, vega.bestfit_corr_stats,
                              scan_results=scan_results)
    from vega_tpu.io.fits import read_fits
    hdus = {h.name: h for h in read_fits(vega.output.outfile)
            if getattr(h, 'name', '')}
    assert 'SCAN' in hdus
    fvals = np.asarray(hdus['SCAN']['fval'])
    assert fvals.shape == (3,)
    assert np.isfinite(fvals).all()


def test_legacy_single_hdu_model_format():
    """The legacy single-HDU 'MODEL' output (9 flat columns per
    correlation) dispatches to old_read_correlations
    (reference: fit_results.py:99-101, 144-175)."""
    from vega_tpu.io.fits import Header, TableHDU
    from vega_tpu.postprocess.fit_results import FitResults

    rng = np.random.default_rng(5)
    columns = {}
    n = 20
    for corr in ('lyaxlya', 'qsoxlya'):
        columns[corr + '_MODEL'] = rng.normal(size=n)
        columns[corr + '_MODEL_MASK'] = np.ones(n, dtype=bool)
        columns[corr + '_DATA'] = rng.normal(size=n)
        columns[corr + '_MASK'] = np.arange(n) % 2 == 0
        columns[corr + '_VAR'] = np.ones(n)
        columns[corr + '_RP'] = np.linspace(0, 200, n)
        columns[corr + '_RT'] = np.linspace(0, 200, n)
        columns[corr + '_Z'] = np.full(n, 2.3)
        columns[corr + '_CHI2'] = np.array([1.0])
    hdu = TableHDU(Header(), columns, name="MODEL")

    results = FitResults.__new__(FitResults)
    results.num_pars = 2
    results.marg_coeff = {}
    results.read_correlations([hdu])
    assert set(results.correlations) == {'lyaxlya', 'qsoxlya'}
    assert results.num_data_points == 20
    out = results.correlations['qsoxlya']
    np.testing.assert_array_equal(out.data, columns['qsoxlya_DATA'])
    assert out.chisq is None
