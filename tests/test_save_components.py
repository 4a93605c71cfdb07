"""save-components mode (write_pk / write_cf) and the component HDUs."""

import numpy as np
import pytest

from vega_tpu.io.fits import read_fits
from vega_tpu.testing import make_synthetic_dataset
from vega_tpu.vega_interface import VegaInterface


def test_save_components_and_write(tmp_path):
    main_path = make_synthetic_dataset(tmp_path, cross=False, size='tiny',
                                       noise=1.0)
    text = main_path.read_text().replace(
        '[output]\n', '[output]\nwrite_pk = True\nwrite_cf = True\n')
    main_path.write_text(text)

    vega = VegaInterface(main_path)
    assert vega.fiducial['save-components']
    model = vega.compute_model(run_init=False)
    name = next(iter(vega.corr_items))

    m = vega.models[name]
    assert 'core' in m.pk['peak'] and 'core' in m.pk['smooth']
    assert 'core' in m.xi['peak'] and 'core' in m.xi_distorted['smooth']
    # peak + smooth recombine into the returned model
    combined = (vega.params['bao_amp'] * m.xi_distorted['peak']['core']
                + m.xi_distorted['smooth']['core'])
    np.testing.assert_allclose(combined, model[name], rtol=1e-10)

    vega.minimize()
    vega.output.write_results(vega.bestfit_model, vega.params,
                              vega.minimizer, vega.bestfit_corr_stats,
                              models=vega.models)
    outfile = vega.output.outfile + '.fits'
    names = {h.name for h in read_fits(outfile) if getattr(h, 'name', '')}
    assert f'PK_{name}' in names
    assert f'Xi_{name}' in names
