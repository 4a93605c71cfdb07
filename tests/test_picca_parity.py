"""Cross-code parity: model vectors against picca fitter2 golden data.

Mirrors the reference's tests/test_vega.py::test_vega_old: 7 auto and 7
cross model configurations (toggling HCD models, Arinyo/McDonald NL,
velocity dispersion, radiation effects, relativistic/asymmetry terms,
Croom evolution, the legacy FFTLog path) compared against the picca
fitter2 output vectors stored in tests/data/picca_bench_data.fits.
"""

from pathlib import Path

import numpy as np
import pytest

REF = Path('/root/reference')

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not REF.exists(),
                                reason='reference checkout not present')]


@pytest.fixture(scope='module')
def bench_data():
    from vega_tpu.io.fits import read_fits
    from vega_tpu.utils import find_file
    return read_fits(find_file('data/picca_bench_data.fits'))


def test_picca_auto_parity(bench_data):
    from vega_tpu import VegaInterface
    names = ['test_' + str(i) for i in range(8)]
    names.remove('test_3')

    vega_auto = VegaInterface(
        'examples/picca_benchmarks/configs/vega/main.ini')
    vega_auto.fiducial['Omega_de'] = None
    xi_auto = vega_auto.compute_model(run_init=True)

    for name in names:
        xi_picca = np.array(bench_data[1]['auto_' + name])
        assert np.allclose(xi_auto[name], xi_picca), f'auto {name}'


def test_picca_cross_parity(bench_data):
    from vega_tpu import VegaInterface
    names = ['test_' + str(i) for i in range(8)]
    names.remove('test_3')

    vega_cross = VegaInterface(
        'examples/picca_benchmarks/configs/vega/main_cross.ini')
    vega_cross.fiducial['Omega_de'] = None
    xi_cross = vega_cross.compute_model(run_init=True)

    for name in names:
        xi_picca = np.array(bench_data[2]['cross_' + name])
        assert np.allclose(xi_cross[name], xi_picca), f'cross {name}'
