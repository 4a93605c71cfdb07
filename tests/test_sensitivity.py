"""Fisher sensitivity: exact jacfwd vs the reference-style central
finite differences."""

import numpy as np
import pytest

from vega_tpu.testing import make_synthetic_dataset
from vega_tpu.vega_interface import VegaInterface


def test_exact_matches_finite_differences(tmp_path):
    vega = VegaInterface(make_synthetic_dataset(
        tmp_path, cross=False, size='tiny', noise=1.0))
    nominal = {'bias_LYA': (-0.117, 0.01), 'beta_LYA': (1.67, 0.1)}

    vega.compute_sensitivity(nominal=nominal, frac=0.01, verbose=False)
    fd = {p: np.array(v) for p, v in
          vega.sensitivity['partials']['lyaxlya'].items()}
    fisher_fd = {k: np.array(v) for k, v in
                 vega.sensitivity['fisher']['lyaxlya'].items()}

    vega.compute_sensitivity_exact(nominal=nominal, verbose=False)
    exact = vega.sensitivity['partials']['lyaxlya']
    fisher_exact = vega.sensitivity['fisher']['lyaxlya']

    for pname in nominal:
        scale = np.max(np.abs(exact[pname]))
        np.testing.assert_allclose(fd[pname], exact[pname],
                                   atol=1e-3 * scale)
    for key in fisher_fd:
        a, b = fisher_fd[key], fisher_exact[key]
        mask = np.isfinite(a)
        scale = np.max(np.abs(b[mask]))
        np.testing.assert_allclose(a[mask], b[mask], atol=2e-3 * scale)
