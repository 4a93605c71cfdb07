"""Wedge / shell weight matrices and panel plots."""

import matplotlib

matplotlib.use('Agg')

import numpy as np
import pytest

from vega_tpu.plots.rt_wedges import RtWedge
from vega_tpu.plots.shell import Shell
from vega_tpu.plots.wedges import Wedge


def test_wedge_recovers_constant():
    """A constant field compresses to the same constant in every wedge."""
    wedge = Wedge(mu=(0.0, 1.0))
    data = np.full(2500, 3.5)
    r, w = wedge(data)
    mask = wedge.weights.sum(axis=1) > 0
    np.testing.assert_allclose(w[mask], 3.5)
    assert len(r) == 50


def test_wedge_covariance_propagation():
    wedge = Wedge(mu=(0.5, 1.0))
    rng = np.random.default_rng(0)
    data = rng.normal(size=2500)
    cov = np.diag(rng.uniform(0.5, 2.0, 2500))
    r, w, w_cov = wedge(data, cov)
    assert w_cov.shape == (50, 50)
    assert np.all(np.diag(w_cov) >= 0)


def test_wedge_mu_selection():
    """A field that lives only at high mu only shows up in high-mu wedges."""
    coords_mu = np.zeros((50, 50))
    rp = np.arange(2., 200., 4.)
    rt = np.arange(2., 200., 4.)
    rt_mesh, rp_mesh = np.meshgrid(rt, rp)
    mu = rp_mesh / np.sqrt(rp_mesh ** 2 + rt_mesh ** 2)
    data = (mu > 0.95).flatten().astype(float)
    del coords_mu

    high = Wedge(mu=(0.95, 1.0))
    low = Wedge(mu=(0.0, 0.5))
    _, w_high = high(data)
    _, w_low = low(data)
    assert w_high[high.weights.sum(axis=1) > 0].mean() > 0.8
    assert w_low[low.weights.sum(axis=1) > 0].mean() < 0.1


def test_shell_constant():
    shell = Shell(r=(60, 90))
    data = np.full(2500, -1.25)
    ang, sh = shell(data)
    mask = shell.weights.sum(axis=1) > 0
    np.testing.assert_allclose(sh[mask], -1.25)
    assert np.all(np.diff(ang) > 0)


def test_rt_wedge():
    w = RtWedge(rt_cut=(0., 8.0))
    data = np.arange(2500, dtype=float)
    r, vals = w(data)
    assert len(r) == 50
    assert np.isfinite(vals).all()


@pytest.mark.slow
def test_vega_plots_panels(tmp_path):
    from vega_tpu.testing import make_synthetic_dataset
    from vega_tpu.vega_interface import VegaInterface

    vega = VegaInterface(make_synthetic_dataset(tmp_path, cross=False))
    model = vega.compute_model(run_init=False)
    name = next(iter(model))

    fig = vega.plots.plot_4wedges(models=[model[name]], corr_name=name,
                                  mu_bin_labels=True, model_colors=['r'])
    assert len(fig.axes) == 4
    fig = vega.plots.plot_4shells(model=model[name], corr_name=name)
    assert len(fig.axes) == 4

    from vega_tpu.plots.utils import plot_shells
    fig = plot_shells(vega, model, corr=name)
    assert len(fig.axes) == 4
    # every panel drew data/model series with finite values
    ydatas = [ln.get_ydata() for ax in fig.axes for ln in ax.lines
              if len(ln.get_ydata()) > 2]
    assert ydatas and all(np.all(np.isfinite(y)) for y in ydatas)


def test_get_bin_centers_staticmethods():
    limits = np.array([0., 2., 4., 8.])
    expected = np.array([1., 3., 6.])
    np.testing.assert_allclose(Wedge.get_bin_centers(limits), expected)
    np.testing.assert_allclose(Shell.get_bin_centers(limits), expected)


@pytest.mark.slow
def test_sensitivity_plot(tmp_path):
    from vega_tpu.testing import make_synthetic_dataset
    from vega_tpu.vega_interface import VegaInterface

    vega = VegaInterface(make_synthetic_dataset(tmp_path, cross=False,
                                                size='tiny', noise=1.0))
    vega.minimize()
    vega.compute_sensitivity(verbose=False)
    name = next(iter(vega.corr_items))
    pname = next(iter(vega.sample_params['limits']))
    fig = vega.plots.plot_sensitivity(vega.sensitivity, name, pname)
    assert fig is not None


def test_plot_data_matches_manual_compression(tmp_path):
    """plot_data's returned (x, values, cov) equal the Wedge weight
    matrix applied by hand (reference plot.py:191-262 contract)."""
    import matplotlib.pyplot as plt
    from vega_tpu.testing import make_synthetic_dataset
    from vega_tpu.vega_interface import VegaInterface

    vega = VegaInterface(make_synthetic_dataset(tmp_path, cross=False,
                                                size='tiny'))
    name = next(iter(vega.corr_items))
    mu_bin = (0.5, 1.0)

    fig, ax = plt.subplots()
    x, vals, cov = vega.plots.plot_data(ax, mu_bin, corr_name=name)
    plt.close(fig)

    wedge = vega.plots.initialize_wedge(mu_bin, corr_name=name,
                                        is_data=True)
    x2, vals2, cov2 = wedge(np.asarray(vega.plots.data[name]),
                            np.asarray(vega.plots.cov_mat[name]))
    np.testing.assert_allclose(x, x2)
    np.testing.assert_allclose(vals, vals2)
    np.testing.assert_allclose(cov, cov2)


def test_plot_model_masked_path(tmp_path):
    """A model vector on the model grid is masked onto the data grid and
    compressed with the data covariance (reference plot.py:263-338)."""
    import matplotlib.pyplot as plt
    from vega_tpu.testing import make_synthetic_dataset
    from vega_tpu.vega_interface import VegaInterface

    vega = VegaInterface(make_synthetic_dataset(tmp_path, cross=False,
                                                size='tiny'))
    name = next(iter(vega.corr_items))
    model = vega.compute_model(run_init=False)
    mu_bin = (0.0, 0.5)

    fig, ax = plt.subplots()
    x, vals = vega.plots.plot_model(ax, mu_bin, model=model[name],
                                    corr_name=name)
    assert len(ax.lines) == 1
    plt.close(fig)
    assert np.all(np.isfinite(vals)) and len(x) == len(vals)

    # data + model through the composed wedge: same compression grid
    fig, ax = plt.subplots()
    dw, mw = vega.plots.plot_wedge(ax, mu_bin, models=[model[name]],
                                   corr_name=name, data_label='d',
                                   labels=['m'])
    plt.close(fig)
    np.testing.assert_allclose(dw[0], mw[0])


def test_plot_panel_drivers_and_postprocess(tmp_path):
    """plot_1wedge / plot_2wedges / plot_4wedge_panel figure contracts +
    postprocess_fig ylim broadcasting (reference plot.py:375-402,
    587-679, 747-813)."""
    import matplotlib.pyplot as plt
    from vega_tpu.testing import make_synthetic_dataset
    from vega_tpu.vega_interface import VegaInterface

    vega = VegaInterface(make_synthetic_dataset(tmp_path, cross=False,
                                                size='tiny'))
    name = next(iter(vega.corr_items))
    model = vega.compute_model(run_init=False)

    fig = vega.plots.plot_1wedge(models=[model[name]], corr_name=name,
                                 data_label='data', labels=['model'])
    assert len(fig.axes) == 1
    plt.close(fig)

    fig = vega.plots.plot_2wedges(models=[model[name]], corr_name=name,
                                  data_label='data', labels=['model'])
    assert len(fig.axes) == 2
    plt.close(fig)

    fig = vega.plots.plot_4wedge_panel(model=model[name], corr_name=name)
    ax = fig.axes[0]
    # 4 wedges x (model line + errorbar data line)
    assert len([ln for ln in ax.lines if len(ln.get_xdata()) > 2]) >= 8
    vega.plots.postprocess_fig(fig, xlim=(0, 150), ylim=(-5, 5))
    assert ax.get_xlim() == (0.0, 150.0)
    vega.plots.postprocess_fig(fig, ylim=[(-1, 1)])
    assert ax.get_ylim() == (-1.0, 1.0)
    with pytest.raises(ValueError, match='unsupported ndim'):
        vega.plots.postprocess_fig(fig, ylim=np.zeros((1, 1, 2)))
    plt.close(fig)
