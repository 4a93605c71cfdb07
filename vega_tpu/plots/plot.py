"""Plotting: wedge / shell panels for correlation data and models.

Counterpart of the reference's vega/plots/plot.py (the essential API:
plot_wedge / plot_1wedge / plot_2wedges / plot_4wedges / plot_4shells /
plot_sensitivity). The weight-matrix machinery lives in wedges.py and
shell.py; everything here is host-side matplotlib.
"""

from __future__ import annotations

import numpy as np
import matplotlib
import matplotlib.pyplot as plt

from .shell import Shell
from .wedges import Wedge

MU_BINS_4 = [(0.95, 1.0), (0.8, 0.95), (0.5, 0.8), (0.0, 0.5)]


class VegaPlots:
    """Plotting module (reference: plots/plot.py:9-120 for init)."""

    def __init__(self, vega_data=None):
        self.cross_flag = {}
        self.data = {}
        self.cov_mat = {}
        self.rp_setup_model = {}
        self.rt_setup_model = {}
        self.r_setup_model = {}
        self.rp_setup_data = {}
        self.rt_setup_data = {}
        self.r_setup_data = {}
        self.has_data = False
        self.cuts = {}
        self.mask = {}
        self.fig = None

        if vega_data is not None:
            for name, data in vega_data.items():
                cross_flag = data.tracer1['type'] != data.tracer2['type']
                self.cross_flag[name] = cross_flag
                self.data[name] = data.data_vec
                if data.has_cov_mat_org:
                    self.cov_mat[name] = data.cov_mat_org

                (self.rp_setup_data[name], self.rt_setup_data[name],
                 self.r_setup_data[name]) = self.initialize_coordinates(
                    data.data_coordinates)
                self.cuts[name] = {'r_min': data.r_min_cut,
                                   'r_max': data.r_max_cut}
                self.mask[name] = \
                    data.dist_model_coordinates.get_mask_to_other(
                        data.data_coordinates)
                (self.rp_setup_model[name], self.rt_setup_model[name],
                 self.r_setup_model[name]) = self.initialize_coordinates(
                    data.model_coordinates)
            self.has_data = True

    @staticmethod
    def initialize_coordinates(coordinates):
        rp_setup = (coordinates.rp_min, coordinates.rp_max,
                    coordinates.rp_nbins)
        rt_setup = (0., coordinates.rt_max, coordinates.rt_nbins)
        return rp_setup, rt_setup, rt_setup

    def initialize_wedge(self, mu_bin, corr_name=None, is_data=False,
                         cross_flag=False, rp_setup=None, rt_setup=None,
                         r_setup=None, abs_mu=True, **kwargs):
        """(reference: plots/plot.py:81-150)"""
        if corr_name is not None:
            if is_data:
                rp = self.rp_setup_data[corr_name]
                rt = self.rt_setup_data[corr_name]
                r = self.r_setup_data[corr_name]
            else:
                rp = self.rp_setup_model[corr_name]
                rt = self.rt_setup_model[corr_name]
                r = self.r_setup_model[corr_name]
            if self.cross_flag[corr_name] and abs_mu:
                r = (0, rp[1], rp[2] // 2)
        else:
            rp = rp_setup if rp_setup is not None else (0., 200., 50)
            rt = rt_setup if rt_setup is not None else (0., 200., 50)
            r = r_setup if r_setup is not None else rt
            if cross_flag and abs_mu:
                r = (0, rp[1], rp[2] // 2)
        return Wedge(rp=rp, rt=rt, r=r, mu=mu_bin, abs_mu=abs_mu)

    # ------------------------------------------------------------------
    def plot_wedge(self, ax, mu_bin, corr_name=None, models=None,
                   labels=None, data=None, cov_mat=None, model_colors=None,
                   data_label=None, scaling_power=2, abs_mu=True,
                   use_local_coordinates=True, **kwargs):
        """Plot one mu wedge of data +/- models onto an axis
        (reference: plots/plot.py:152-320 condensed)."""
        if corr_name is not None and corr_name in self.data and data is None:
            data = self.data.get(corr_name)
            cov_mat = self.cov_mat.get(corr_name)

        if data is not None:
            wedge_data = self.initialize_wedge(
                mu_bin, corr_name if use_local_coordinates else None,
                is_data=True, abs_mu=abs_mu, **kwargs)
            if cov_mat is not None:
                r, wedge, wedge_cov = wedge_data(data, cov_mat)
                ax.errorbar(r, wedge * r ** scaling_power,
                            yerr=np.sqrt(np.diag(wedge_cov))
                            * r ** scaling_power,
                            fmt='o', ms=3, color='k', label=data_label)
            else:
                r, wedge = wedge_data(data)
                ax.plot(r, wedge * r ** scaling_power, 'k.',
                        label=data_label)

        if models is not None:
            wedge_model = self.initialize_wedge(
                mu_bin, corr_name if use_local_coordinates else None,
                is_data=False, abs_mu=abs_mu, **kwargs)
            colors = model_colors or [None] * len(models)
            model_labels = labels or [None] * len(models)
            for model, color, label in zip(models, colors, model_labels):
                model = np.asarray(model)
                r, wedge = wedge_model(model)
                ax.plot(r, wedge * r ** scaling_power, color=color,
                        label=label)

        ax.set_xlabel(r'$r~[\mathrm{Mpc/h}]$')
        ax.set_ylabel(rf'$r^{scaling_power} \xi(r)$')
        return ax

    def _panel_plot(self, mu_bins, ncols, nrows, corr_name=None, models=None,
                    labels=None, data=None, cov_mat=None, title=None,
                    mu_bin_labels=False, model_colors=None, xlim=None,
                    no_font=False, **kwargs):
        fig, axes = plt.subplots(nrows, ncols,
                                 figsize=(6 * ncols, 4.5 * nrows),
                                 squeeze=False)
        for ax, mu_bin in zip(axes.flatten(), mu_bins):
            self.plot_wedge(ax, mu_bin, corr_name=corr_name, models=models,
                            labels=labels, data=data, cov_mat=cov_mat,
                            model_colors=model_colors, **kwargs)
            if mu_bin_labels:
                ax.set_title(rf'${mu_bin[0]} < \mu < {mu_bin[1]}$')
            if xlim is not None:
                ax.set_xlim(xlim)
            if labels is not None:
                ax.legend()
        if title is not None:
            fig.suptitle(title)
        fig.tight_layout()
        self.fig = fig
        return fig

    def plot_1wedge(self, mu_bin=(0, 1), **kwargs):
        return self._panel_plot([mu_bin], 1, 1, **kwargs)

    def plot_2wedges(self, mu_bins=((0.5, 1.0), (0.0, 0.5)), **kwargs):
        return self._panel_plot(list(mu_bins), 2, 1, **kwargs)

    def plot_4wedges(self, mu_bins=None, **kwargs):
        """(reference: plots/plot.py:681-812)"""
        return self._panel_plot(mu_bins or MU_BINS_4, 2, 2, **kwargs)

    # ------------------------------------------------------------------
    def plot_4shells(self, model=None, corr_name=None,
                     r_shells=((30, 45), (60, 75), (90, 110), (130, 150)),
                     angle_var='theta', data=None, cov_mat=None, **kwargs):
        """Shell panels + residuals (reference: plots/plot.py:814-890)."""
        if corr_name is not None and data is None:
            data = self.data.get(corr_name)
            cov_mat = self.cov_mat.get(corr_name)

        fig, axes = plt.subplots(2, 2, figsize=(12, 9), squeeze=False)
        for ax, r_bin in zip(axes.flatten(), r_shells):
            rp = (self.rp_setup_model.get(corr_name, (0., 200., 50))
                  if corr_name else (0., 200., 50))
            rt = (self.rt_setup_model.get(corr_name, (0., 200., 50))
                  if corr_name else (0., 200., 50))
            shell = Shell(rp=rp, rt=rt, r=r_bin, angle_var=angle_var)
            if data is not None:
                if cov_mat is not None:
                    ang, sh, sh_cov = shell(data, cov_mat)
                    ax.errorbar(ang, sh, yerr=np.sqrt(np.diag(sh_cov)),
                                fmt='o', ms=3, color='k')
                else:
                    ang, sh = shell(data)
                    ax.plot(ang, sh, 'k.')
            if model is not None:
                model_arr = np.asarray(model)
                if corr_name is not None and \
                        model_arr.size != self.data[corr_name].size:
                    model_arr = model_arr[self.mask[corr_name]]
                ang, sh = shell(model_arr)
                ax.plot(ang, sh, 'r-')
            ax.set_title(rf'${r_bin[0]} < r < {r_bin[1]}$')
            ax.set_xlabel(r'$\theta$ [deg]' if angle_var == 'theta'
                          else rf'$\{angle_var}$')
            ax.set_ylabel(r'$\xi$')
        fig.tight_layout()
        self.fig = fig
        return fig

    # ------------------------------------------------------------------
    def plot_sensitivity(self, sensitivity, corr_name, param,
                         idistort=0, **kwargs):
        """Heatmap of the Fisher information over the (rp, rt) grid
        (reference: plots/plot.py:892-1010)."""
        rp = self.rp_setup_model[corr_name]
        rt = self.rt_setup_model[corr_name]
        fisher = sensitivity['fisher'][corr_name]
        key = (param, param) if (param, param) in fisher else param
        grid = np.asarray(fisher[key])[idistort].reshape(rp[2], rt[2])

        fig, ax = plt.subplots(figsize=(8, 6))
        extent = [rt[0], rt[1], rp[0], rp[1]]
        im = ax.imshow(grid, origin='lower', extent=extent, aspect='auto',
                       cmap='RdBu_r')
        fig.colorbar(im, ax=ax, label='Fisher information')
        ax.set_xlabel(r'$r_\perp~[\mathrm{Mpc/h}]$')
        ax.set_ylabel(r'$r_\parallel~[\mathrm{Mpc/h}]$')
        ax.set_title(f'{corr_name}: {param}')
        self.fig = fig
        return fig
