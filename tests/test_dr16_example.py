"""The eBOSS_DR16 example (examples/eBOSS_DR16) end-to-end: config
generation through BuildConfig, the four-correlation combined fit, and
the global-covariance variant (reference: examples/eBOSS_DR16/
main_combined.ini, vega_interface.py:888-954)."""

import importlib.util

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import sys
from pathlib import Path

EXAMPLE_DIR = Path(__file__).resolve().parents[1] / 'examples' / 'eBOSS_DR16'


def _load_example():
    spec = importlib.util.spec_from_file_location(
        'dr16_run_synthetic', EXAMPLE_DIR / 'run_synthetic.py')
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_dr16_combined_and_global_cov(tmp_path):
    ex = _load_example()
    nt = 12

    mains = ex.build_configs(tmp_path, nt)
    assert set(mains) == {'auto', 'cross', 'combined'}
    ex.regenerate_from_truth(tmp_path, mains['combined'], nt)

    values, errors = ex.run_fit('combined', mains['combined'])
    for par in ('ap', 'at'):
        assert abs(values[par] - 1.0) < 5 * max(errors[par], 1e-12)

    gcov = ex.make_global_cov(tmp_path, mains['combined'])
    gmains = ex.build_configs(tmp_path, nt, extension='gcov',
                              global_cov_file=gcov,
                              fit_types={'combined': ex.FIT_TYPES['combined']})
    gvalues, gerrors = ex.run_fit('combined-globalcov', gmains['combined'])
    # block-diagonal global cov == per-corr covs: same best fit
    for par in ('ap', 'at', 'bias_LYA', 'beta_LYA'):
        assert abs(gvalues[par] - values[par]) < 1e-5


def test_dr16_full_parameter_set(tmp_path):
    """The full Table-6-style sampled set (BAO + HCD + metal biases +
    QSO cross nuisances, 10 parameters) fits end-to-end ENTIRELY on the
    grid-collapse fast path: all four nonlinear scale parameters
    (ap, at, drp_QSO, sigma_velo_disp_lorentz_QSO) are grid dimensions
    — the 4-dim node schedule is the anisotropic combination
    (gridcollapse.plan_components) — and the HCD/metal/bias parameters
    stay collapsed coefficients (division-free Kaiser). This is the
    execution route a real DR16 combined run takes out of the box
    (reference examples/eBOSS_DR16/main_combined.ini samples exactly
    these scale parameters)."""
    ex = _load_example()
    nt = 12

    mains = ex.build_configs(tmp_path, nt)
    ex.regenerate_from_truth(tmp_path, mains['combined'], nt)

    fmains = ex.build_configs(
        tmp_path, nt, extension='full',
        fit_types={'combined': ex.FIT_TYPES['combined']},
        sample_params=ex.SAMPLED_FULL,
        control_extra=ex.CONTROL_FULL_TEST)
    from vega_tpu.vega_interface import VegaInterface
    vega = VegaInterface(fmains['combined'])
    payload = vega.get_collapsed(tuple(ex.SAMPLED_FULL))
    spec = payload.get('__grid__')
    assert spec is not None
    assert set(spec.names) == {'ap', 'at', 'drp_QSO',
                               'sigma_velo_disp_lorentz_QSO'}
    # every correlation — crosses included — is grid-served
    assert sorted(k for k in payload if k != '__grid__') \
        == sorted(vega.corr_items)

    values, errors = ex.run_fit('combined-full-params',
                                fmains['combined'],
                                sampled=ex.SAMPLED_FULL)
    assert set(ex.SAMPLED_FULL) <= set(values)
    for par in ex.SAMPLED_FULL:
        assert np.isfinite(errors[par]) and errors[par] > 0
