"""picca.constants shim: FLRW comoving distances (Mpc/h) via scipy
quadrature + the published absorber rest-wavelength table (see
README.md). Independent re-implementation of the standard formulas; no
vega_tpu numerics involved."""

import numpy as np
from scipy.integrate import quad
from scipy.interpolate import interp1d

SPEED_LIGHT = 299792.458  # km/s


class Cosmo:
    def __init__(self, Om, Ok=0.0, Or=0.0, wl=-1.0, H0=100.0,
                 verbose=False, **kwargs):
        self.Om, self.Ok, self.Or, self.wl = Om, Ok, Or, wl
        Ode = 1.0 - Om - Ok - Or
        hubble_dist = SPEED_LIGHT / 100.0    # Mpc/h

        def e_of_z(z):
            return np.sqrt(Om * (1 + z) ** 3 + Or * (1 + z) ** 4
                           + Ok * (1 + z) ** 2
                           + Ode * (1 + z) ** (3 * (1 + wl)))

        self._e_of_z = e_of_z
        z_tab = np.linspace(0.0, 12.0, 2000)
        dc = np.array([quad(lambda zz: 1.0 / e_of_z(zz), 0.0, z)[0]
                       for z in z_tab]) * hubble_dist
        self._r_comov = interp1d(z_tab, dc, kind='cubic')

    def get_r_comov(self, z):
        return self._r_comov(np.asarray(z, dtype=float))

    def get_dist_hubble(self, z):
        return (SPEED_LIGHT / 100.0) / self._e_of_z(
            np.asarray(z, dtype=float))


ABSORBER_IGM = {
    'LYA': 1215.67,
    'LYB': 1025.7223,
    'SiII(1190)': 1190.4158,
    'SiII(1193)': 1193.2897,
    'SiIII(1207)': 1206.500,
    'SiII(1260)': 1260.4221,
    'SiII(1526)': 1526.70698,
    'CIV(1548)': 1548.2049,
    'CIV(eff)': 1549.06,
    'CIV(1550)': 1550.77845,
    'MgII(2796)': 2796.3511,
    'MgII(2803)': 2803.5324,
    'FeII(2344)': 2344.2129601,
    'FeII(2374)': 2374.4603294,
    'FeII(2382)': 2382.7641781,
    'FeII(2586)': 2586.6495659,
    'FeII(2600)': 2600.1724835,
    'AlII(1670)': 1670.7886,
    'AlIII(1854)': 1854.71829,
    'AlIII(1862)': 1862.79113,
    'NV(1238)': 1238.821,
    'NV(1242)': 1242.804,
    'OI(1039)': 1039.230,
    'SiII(989)': 989.8731,
    'OVI(1031)': 1031.9261,
    'OVI(1037)': 1037.6167,
    'CIII(977)': 977.020,
    'CII(1334)': 1334.5323,
}
