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
