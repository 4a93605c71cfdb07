"""Cosmology module: growth factor and comoving distances."""

import numpy as np
import pytest
from scipy.integrate import quad

from vega_tpu.cosmo import (
    ABSORBER_IGM, Cosmo, SPEED_OF_LIGHT, growth_function, hubble)


def test_growth_function_matches_direct_quadrature():
    om, ode = 0.315, 0.685

    def direct(z):
        a = 1 / (1 + z)
        integral = quad(lambda aa: 1 / (aa * hubble(1 / aa - 1, om, ode))
                        ** 3, 0, a)[0]
        return 2.5 * om * hubble(z, om, ode) * integral

    for z in (0.0, 1.0, 2.3, 3.5):
        assert growth_function(z, om, ode) == pytest.approx(direct(z),
                                                            rel=1e-6)


def test_growth_decreases_with_redshift():
    z = np.linspace(0, 5, 20)
    d = growth_function(z, 0.315, 0.685)
    assert np.all(np.diff(d) < 0)


def test_comoving_distance_matches_quadrature():
    cosmo = Cosmo(Om=0.315, Ok=0.0, Or=0.0, wl=-1.0)

    def e_of_z(z):
        return np.sqrt(0.315 * (1 + z) ** 3 + 0.685)

    for z in (0.5, 2.0, 2.4, 3.5):
        expected = quad(lambda zz: (SPEED_OF_LIGHT / 100.0) / e_of_z(zz),
                        0, z)[0]
        assert cosmo.get_r_comov(z) == pytest.approx(expected, rel=1e-5)
    # the value picca quotes at z = 2.4 for Om = 0.315 (with radiation):
    # 3941.86 Mpc/h — without radiation we land within ~0.2%
    assert cosmo.get_r_comov(2.4) == pytest.approx(3941.86, rel=3e-3)


def test_hubble_distance():
    cosmo = Cosmo(Om=0.315)
    for z in (0.0, 2.3):
        e = np.sqrt(0.315 * (1 + z) ** 3 + 0.685)
        assert cosmo.get_dist_hubble(z) == pytest.approx(
            SPEED_OF_LIGHT / 100.0 / e, rel=1e-6)


def test_absorber_table():
    assert ABSORBER_IGM['LYA'] == pytest.approx(1215.67)
    assert ABSORBER_IGM['SiIII(1207)'] == pytest.approx(1206.50)
    assert ABSORBER_IGM['CIV(eff)'] == pytest.approx(1549.06)


def test_blinding_helpers():
    from vega_tpu.utils import apply_blinding
    params = {'growth_rate': 0.97}
    out = apply_blinding(params, {'growth_rate': 0.5})
    assert out['growth_rate'] == pytest.approx(
        0.97 + np.pi - np.exp(0.25))
