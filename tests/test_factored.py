"""Factored linear-model path (vega_tpu/factored.py) vs the dense
pipeline.

The factored representation is exact linear-algebra reassociation, so
batched chi^2 values must match the dense graph (VEGA_TPU_FACTORED=0)
and the eager serial evaluation to float-reassociation level. Each case
exercises a different classification boundary: fully-static grids,
sampled grid-shaping parameters (dense fallback), sampled AP parameters
(partial factoring), and additive-term amplitudes.
"""

import tempfile

import numpy as np
import pytest


def _build(monkeypatch, factored, sample=None, **kwargs):
    if not factored:
        monkeypatch.setenv('VEGA_TPU_FACTORED', '0')
    else:
        monkeypatch.setenv('VEGA_TPU_FACTORED', '1')
    from vega_tpu.testing import make_synthetic_dataset
    from vega_tpu.vega_interface import VegaInterface

    workdir = tempfile.mkdtemp(prefix='vega_tpu_factored_')
    main_path = make_synthetic_dataset(workdir, cross=True, size='tiny',
                                       sample=sample, **kwargs)
    return VegaInterface(main_path)


def _chi2_batch(vega, batch):
    from vega_tpu.parallel import BatchedLikelihood
    return BatchedLikelihood(vega).chi2(batch)


BIAS_BATCH = {
    'bias_LYA': np.array([-0.117, -0.13, -0.10, -0.117]),
    'beta_LYA': np.array([1.67, 1.5, 1.9, 1.67]),
}


def test_factored_matches_dense_bias_beta(monkeypatch):
    """Standard BAO sampling (bias/beta): full factoring incl. the chi^2
    quadratic form."""
    vega_f = _build(monkeypatch, True, with_distortion=True)
    chi2_f = _chi2_batch(vega_f, BIAS_BATCH)
    vega_d = _build(monkeypatch, False, with_distortion=True)
    chi2_d = _chi2_batch(vega_d, BIAS_BATCH)
    # the collapsed quadratic form is CENTERED on the collapse-time
    # coefficients (chi2 = r'Cr - 2dc.Wr + dc.A dc), so there is no
    # large-magnitude cancellation even at chi2 ~ 0; only float
    # reassociation noise remains
    assert chi2_f == pytest.approx(chi2_d, rel=1e-11, abs=1e-12)
    # and both match the eager serial evaluation
    for i in range(len(chi2_f)):
        serial = vega_d.chi2({k: float(v[i]) for k, v in BIAS_BATCH.items()})
        assert chi2_f[i] == pytest.approx(serial, rel=1e-9, abs=1e-12)


def test_factored_matches_dense_grid_param_sampled(monkeypatch):
    """A sampled grid-shaping parameter (sigmaNL_par) disables the
    Kaiser factorization — the dense fallback must stay exact."""
    sample = {'bias_LYA': 'True', 'beta_LYA': 'True', 'sigmaNL_par': 'True'}
    batch = dict(BIAS_BATCH, sigmaNL_par=np.array([6.37, 6.0, 6.8, 6.37]))
    vega_f = _build(monkeypatch, True, sample=sample)
    chi2_f = _chi2_batch(vega_f, batch)
    vega_d = _build(monkeypatch, False, sample=sample)
    chi2_d = _chi2_batch(vega_d, batch)
    assert chi2_f == pytest.approx(chi2_d, rel=1e-11, abs=1e-18)


def test_factored_matches_dense_ap_at_sampled(monkeypatch):
    """Sampled AP parameters make the spline positions traced: the
    transform contracts before the spline (partial factoring) and the
    result must match the dense graph. (The default grid-collapse fast
    path for this regime is interpolative and has its own oracle in
    tests/test_grid_collapse.py; it is disabled here because this test
    pins the EXACT partial-factored reassociation.)"""
    monkeypatch.setenv('VEGA_TPU_GRID_COLLAPSE', '0')
    sample = {'bias_LYA': 'True', 'beta_LYA': 'True',
              'ap': 'True', 'at': 'True'}
    batch = dict(BIAS_BATCH,
                 ap=np.array([1.0, 0.98, 1.03, 1.0]),
                 at=np.array([1.0, 1.02, 0.97, 1.0]))
    vega_f = _build(monkeypatch, True, sample=sample)
    chi2_f = _chi2_batch(vega_f, batch)
    vega_d = _build(monkeypatch, False, sample=sample)
    chi2_d = _chi2_batch(vega_d, batch)
    assert chi2_f == pytest.approx(chi2_d, rel=1e-11, abs=1e-18)


def test_factored_matches_dense_mul_broadband_sampled(monkeypatch):
    """A sampled multiplicative-broadband coefficient densifies the
    factored model; the mul polynomial must be applied exactly once
    (regression: the fallthrough used to apply it twice)."""
    import configparser
    from pathlib import Path

    bb_param = 'BB-lyaxlya-0 mul pre r,mu (0,0)'

    def _build_bb(factored):
        if not factored:
            monkeypatch.setenv('VEGA_TPU_FACTORED', '0')
        else:
            monkeypatch.setenv('VEGA_TPU_FACTORED', '1')
        from vega_tpu.testing import make_synthetic_dataset
        from vega_tpu.vega_interface import VegaInterface

        workdir = Path(tempfile.mkdtemp(prefix='vega_tpu_factored_bb_'))
        main_path = make_synthetic_dataset(
            workdir, cross=False, size='tiny',
            sample={'bias_LYA': 'True', 'beta_LYA': 'True',
                    bb_param: '-1. 1. 0.15 0.01'})
        with open(workdir / 'lyaxlya.ini', 'a') as f:
            f.write('\n[broadband]\nbb1 = mul pre r,mu 0:0:1 0:0:1\n')
        config = configparser.ConfigParser()
        config.optionxform = lambda option: option
        config.read(main_path)
        config['parameters'][bb_param] = '0.15'
        with open(main_path, 'w') as f:
            config.write(f)
        return VegaInterface(main_path)

    batch = dict(BIAS_BATCH)
    batch[bb_param] = np.array([0.15, 0.0, 0.3, -0.1])
    vega_f = _build_bb(True)
    chi2_f = _chi2_batch(vega_f, batch)
    vega_d = _build_bb(False)
    chi2_d = _chi2_batch(vega_d, batch)
    assert chi2_f == pytest.approx(chi2_d, rel=1e-10, abs=1e-8)
    serial = vega_d.chi2({k: float(v[2]) for k, v in batch.items()})
    assert chi2_f[2] == pytest.approx(serial, rel=1e-8, abs=1e-8)


def test_factored_gradient_matches_dense(monkeypatch):
    """Exact gradients through the quadratic form agree with the dense
    graph's gradients (the minimizer path)."""
    vega_f = _build(monkeypatch, True)
    val_f, grad_f = vega_f.chi2_value_and_gradient(
        {'bias_LYA': -0.12, 'beta_LYA': 1.7})
    vega_d = _build(monkeypatch, False)
    val_d, grad_d = vega_d.chi2_value_and_gradient(
        {'bias_LYA': -0.12, 'beta_LYA': 1.7})
    assert val_f == pytest.approx(val_d, rel=1e-11)
    for name in grad_f:
        assert grad_f[name] == pytest.approx(grad_d[name], rel=1e-8)
