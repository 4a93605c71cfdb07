"""Scale-parameter (alpha_par / alpha_perp) parametrisations.

Trace-time re-implementation of the reference's vega/scale_parameters.py:
all branching is on static config flags and the 'peak' component flag, the
arithmetic is jax-traceable.
"""

from __future__ import annotations

import jax.numpy as jnp


class ScaleParameters:
    """ap/at extraction for ap_at, aiso_epsilon and phi_alpha
    parametrisations (reference: scale_parameters.py:4-231)."""

    def __init__(self, config):
        self.full_shape = config.getboolean('full-shape', False)
        self.full_shape_alpha = config.getboolean('full-shape-alpha', False)
        self.smooth_scaling = config.getboolean('smooth-scaling', False)
        self.metal_scaling = config.getboolean('metal-scaling', False)
        self.two_alpha_smooth = config.getboolean('two-alpha-smooth', False)

        if self.full_shape_alpha and self.two_alpha_smooth:
            raise ValueError('The "full-shape-alpha" and "two-alpha-smooth" '
                             'options are incompatible.')
        if self.metal_scaling and self.two_alpha_smooth:
            raise ValueError('The "metal-scaling" and "two-alpha-smooth" '
                             'options are incompatible.')

        self.parametrisation = config.get('cosmo fit func', 'ap_at')
        if self.parametrisation not in ['ap_at', 'aiso_epsilon', 'phi_alpha']:
            raise ValueError(f'Unknown parametrisation {self.parametrisation}.')

    def get_ap_at(self, params, corr_name=None, metal_corr=False):
        """(alpha_par, alpha_perp); 'peak' in params is a static bool
        (reference: scale_parameters.py:38-66)."""
        if metal_corr and not self.metal_scaling:
            return self.default()
        if self.full_shape:
            return self.get_fullshape_params(params, corr_name)
        if bool(params['peak']):
            return self.get_bao_params(params)
        if self.smooth_scaling:
            return self.get_fullshape_params(params, corr_name)
        return self.default()

    @staticmethod
    def default():
        return 1., 1.

    def get_bao_params(self, params):
        if self.parametrisation == 'ap_at':
            return self.ap_at(params)
        if self.parametrisation == 'aiso_epsilon':
            return self.aiso_epsilon(params)
        return self.phi_alpha(params)

    def get_fullshape_params(self, params, corr_name=None):
        if self.parametrisation != 'phi_alpha' and not self.full_shape_alpha:
            raise ValueError(
                'Only the "phi_alpha" parametrisation works with split '
                'full-shape. Set full-shape-alpha to True otherwise.')
        if self.parametrisation == 'ap_at':
            return self.ap_at(params, 'ap_full', 'at_full')
        if self.parametrisation == 'aiso_epsilon':
            return self.aiso_epsilon(params, 'aiso_full', 'epsilon_full')
        return self.get_fullshape_phi_alpha(params, corr_name)

    def get_fullshape_phi_alpha(self, params, corr_name=None):
        phi_name = 'phi_full' if self.full_shape else 'phi_smooth'
        if self.full_shape_alpha:
            alpha_name = 'alpha_full'
        elif bool(params['peak']):
            alpha_name = 'alpha'
        elif self.two_alpha_smooth:
            alpha_name = f'alpha_smooth_{corr_name}'
        else:
            alpha_name = 'alpha_smooth'
        return self.phi_alpha(params, phi_name, alpha_name)

    @staticmethod
    def ap_at(params, ap_name='ap', at_name='at'):
        return params[ap_name], params[at_name]

    @staticmethod
    def aiso_epsilon(params, aiso_name='aiso', epsilon_name='epsilon'):
        aiso = params[aiso_name]
        epsilon = params[epsilon_name]
        return aiso * (1 + epsilon) ** 2, aiso / (1 + epsilon)

    @staticmethod
    def phi_alpha(params, phi_name='phi', alpha_name='alpha'):
        phi = params[phi_name]
        alpha = params[alpha_name]
        return alpha / jnp.sqrt(phi), alpha * jnp.sqrt(phi)
