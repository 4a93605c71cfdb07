"""Config builder: generated configs must load into a working fit."""

import numpy as np
import pytest

from vega_tpu.build_config import BuildConfig, make_correlation_template


def test_correlation_templates():
    for name in BuildConfig.recognised_correlations:
        config = make_correlation_template(name)
        assert config['data']['name'] == name
        assert config['data']['tracer1-type'] in ('continuous', 'discrete')
        assert 'r-min' in config['cuts']

    with pytest.raises(ValueError):
        make_correlation_template('fooxbar')


def test_build_and_run_fit(tmp_path):
    """BuildConfig output feeds straight into VegaInterface + minimize."""
    from vega_tpu.testing import make_synthetic_dataset
    # Generate data + template with the testing factory, then rebuild the
    # configs with BuildConfig on top of the same files
    make_synthetic_dataset(tmp_path, cross=False, size='tiny', noise=1.0)

    builder = BuildConfig(options={
        'template': str(tmp_path / 'fiducial_eh98.fits'),
        'bao_broadening': True,
        'test': True,
    }, overwrite=True)

    main_path = builder.build(
        correlations={'lyaxlya': {
            'corr_path': str(tmp_path / 'cf_synthetic.fits'),
            'r-min': 10, 'r-max': 180}},
        fit_type='lyaxlya',
        fit_info={
            'zeff': 2.33,
            'sample_params': ['bias_LYA', 'beta_LYA'],
            'bias_beta_config': {'LYA': 'bias_beta'},
        },
        out_path=str(tmp_path),
        parameters={'bias_LYA': -0.117, 'beta_LYA': 1.67},
    )

    from vega_tpu.vega_interface import VegaInterface
    vega = VegaInterface(main_path)
    chi2 = vega.chi2()
    assert np.isfinite(chi2)
    assert set(vega.sample_params['limits']) == {'bias_LYA', 'beta_LYA'}


def test_default_helpers():
    assert BuildConfig.get_lya_bias(2.334) == pytest.approx(-0.1167)
    assert BuildConfig.get_qso_bias(2.39) == pytest.approx(3.91)
    assert 0.9 < BuildConfig.get_growth_rate(2.33) < 1.0
