"""Standalone plotting helpers (counterpart of the reference's
vega/plots/utils.py): quick wedge panels without a VegaPlots instance."""

from __future__ import annotations

import numpy as np
import matplotlib.pyplot as plt

from .wedges import Wedge


def array_or_dict(input_obj, corr_name='lyalya_lyalya'):
    """Return input_obj directly if it is an array, or look up corr_name
    when it is a dict (reference: plots/utils.py:8-26)."""
    if isinstance(input_obj, dict):
        return input_obj[corr_name]
    return input_obj


def plot_wedges(models, covariance, multi_model=False, labels=None,
                data=None, cross=False):
    """Four mu-wedge panels of model(s) +/- data
    (reference: plots/utils.py:29-152)."""
    plt.rcParams['font.size'] = 14
    fig, axs = plt.subplots(2, 2, figsize=(18, 12))
    axs = np.array(axs).reshape(-1)
    mus = np.array([0., 0.5, 0.8, 0.95, 1.])

    if not multi_model:
        models = [models]
        labels = [labels] if labels is not None else [None]
    if labels is None:
        labels = [None] * len(models)

    for ax, mu in zip(axs, zip(mus[:-1], mus[1:])):
        if not cross:
            wedge_obj = Wedge(mu=mu, rp=(0., 200., 50), rt=(0., 200., 50),
                              r=(0., 200., 50), abs_mu=True)
        else:
            wedge_obj = Wedge(mu=mu, rp=(-200., 200., 100),
                              rt=(0., 200., 50), r=(0., 200., 50),
                              abs_mu=True)

        if data is not None:
            r_d, wedge_d, cov_d = wedge_obj(np.asarray(data),
                                            np.asarray(covariance))
            ax.errorbar(r_d, wedge_d * r_d ** 2,
                        yerr=np.sqrt(np.diag(cov_d)) * r_d ** 2,
                        fmt='o', ms=3, color='k', label='data')

        for model, label in zip(models, labels):
            model = np.asarray(model)
            r_m, wedge_m, cov_m = wedge_obj(model, np.asarray(covariance))
            ax.plot(r_m, wedge_m * r_m ** 2, label=label)

        ax.set_title(rf'${mu[0]} < |\mu| < {mu[1]}$')
        ax.set_xlabel(r'$r~[\mathrm{Mpc/h}]$')
        ax.set_ylabel(r'$r^2 \xi(r)$')
        if any(lab is not None for lab in labels) or data is not None:
            ax.legend()
    fig.tight_layout()
    return fig
