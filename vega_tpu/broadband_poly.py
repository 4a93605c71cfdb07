"""Broadband polynomials.

Counterpart of the reference's vega/broadband_poly.py. The power-law
design matrices are static per config, so they are precomputed at init
and each per-eval broadband becomes one small (n_bins x n_coeff) matmul
with the gathered coefficient vector (the reference re-builds the triple
tensor product every call, broadband_poly.py:147-198).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class BroadbandPolynomials:
    """(reference: broadband_poly.py:4-72 for the config surface)"""

    def __init__(self, bb_input, cf_name, model_coordinates,
                 dist_model_coordinates):
        self.model_coordinates = model_coordinates
        self.dist_model_coordinates = dist_model_coordinates

        self.bb_terms = {'pre-add': [], 'pre-mul': [],
                         'post-add': [], 'post-mul': []}

        for i, bb in enumerate(bb_input.values()):
            bb = bb.split()
            if len(bb) not in [5, 6]:
                raise ValueError('Broadband setup must have 5 or 6 elements. '
                                 f'Got {len(bb)} elements')
            if bb[0] not in ['add', 'mul']:
                raise ValueError(f'Broadband type must be "add" or "mul". '
                                 f'Got {bb[0]}')
            if bb[1] not in ['pre', 'post']:
                raise ValueError(f'Broadband position must be "pre" or '
                                 f'"post". Got {bb[1]}')
            if bb[2] not in ['rp,rt', 'r,mu']:
                raise ValueError('Broadband coordinates must be "rp,rt" or '
                                 f'"r,mu". Got {bb[2]}')
            for spec in (bb[3], bb[4]):
                if len(spec.split(':')) != 3:
                    raise ValueError('Broadband ranges must be '
                                     f'"min:max:step". Got {spec}')
            if len(bb) > 5 and bb[5] != 'broadband_sky':
                raise ValueError('The sixth broadband element must be '
                                 f'"broadband_sky". Got {bb[5]}')

            r1_min, r1_max, dr1 = (int(v) for v in bb[3].split(':'))
            r2_min, r2_max, dr2 = (int(v) for v in bb[4].split(':'))
            if len(bb) > 5:
                name = f'BB-{cf_name}-{i}-{bb[5]}'
            else:
                name = f'BB-{cf_name}-{i} {bb[0]} {bb[1]} {bb[2]}'

            bb_term = {
                'name': name,
                'func': 'broadband' if len(bb) == 5 else bb[5],
                'coordinates': bb[2],
                'r1_config': (r1_min, r1_max, dr1),
                'r2_config': (r2_min, r2_max, dr2),
            }
            self.bb_terms[f'{bb[1]}-{bb[0]}'] += [bb_term]

        # Precompute the power-law design matrices for each term/position
        self._designs = {}
        for pos_type, terms in self.bb_terms.items():
            coords = (self.model_coordinates if 'pre' in pos_type
                      else self.dist_model_coordinates)
            for term in terms:
                if term['func'] != 'broadband':
                    continue
                key = (pos_type, term['name'])
                self._designs[key] = self._design_matrix(term, coords)

    @staticmethod
    def _design_matrix(bb_term, coordinates):
        """(n_bins, n_coeff) matrix of r1^i * r2^j columns, and the ordered
        coefficient parameter names."""
        if bb_term['coordinates'] == 'r,mu':
            r1 = coordinates.r_grid / 100.
            r2 = coordinates.mu_grid
        else:
            r1 = coordinates.r_grid / 100. * coordinates.mu_grid
            r2 = (coordinates.r_grid / 100.
                  * np.sqrt(1 - coordinates.mu_grid ** 2))

        r1_min, r1_max, dr1 = bb_term['r1_config']
        r2_min, r2_max, dr2 = bb_term['r2_config']
        r1_powers = np.arange(r1_min, r1_max + 1, dr1)
        r2_powers = np.arange(r2_min, r2_max + 1, dr2)

        columns, names = [], []
        for i in r1_powers:
            for j in r2_powers:
                columns.append(r1 ** float(i) * r2 ** float(j))
                names.append(f'{bb_term["name"]} ({i},{j})')
        return np.stack(columns, axis=1), names

    def compute(self, params, pos_type):
        """Total broadband for one position type (reference:
        broadband_poly.py:74-117)."""
        assert pos_type in self.bb_terms, \
            f'pos_type must be one of {list(self.bb_terms)}, got {pos_type}'

        coords = (self.model_coordinates if 'pre' in pos_type
                  else self.dist_model_coordinates)

        bb_total = None
        for term in self.bb_terms[pos_type]:
            if term['func'] == 'broadband':
                design, names = self._designs[(pos_type, term['name'])]
                coeffs = jnp.stack([jnp.asarray(params[name], dtype=design.dtype)
                                    for name in names])
                bb_poly = design @ coeffs
            elif term['func'] == 'broadband_sky':
                bb_poly = self._compute_broadband_sky(
                    term['name'], params, coords)
            else:
                raise ValueError(
                    f'Broadband function {term["func"]} not supported')

            if bb_total is None:
                bb_total = 1 + bb_poly if 'mul' in pos_type else bb_poly
            elif 'mul' in pos_type:
                bb_total = bb_total * (1 + bb_poly)
            else:
                bb_total = bb_total + bb_poly

        if bb_total is None:
            bb_total = 1. if 'mul' in pos_type else 0.
        return bb_total

    def compute_add_terms(self, params, position):
        """Additive broadband as factored [(coeff, column)] terms — the
        polynomial is linear in its coefficient parameters, so each
        design-matrix column becomes one basis term (see
        vega_tpu/factored.py). Returns None when a non-linear term
        (broadband_sky) has sampled parameters and the factored form
        cannot express it."""
        from .factored import RecordingParams, has_tracer

        pos_type = f'{position}-add'
        coords = (self.model_coordinates if position == 'pre'
                  else self.dist_model_coordinates)
        terms = []
        for term in self.bb_terms[pos_type]:
            if term['func'] == 'broadband':
                design, names = self._designs[(pos_type, term['name'])]
                for j, name in enumerate(names):
                    terms.append((params[name], design[:, j]))
            else:
                rec = RecordingParams(params)
                vec = self._compute_broadband_sky(term['name'], rec, coords)
                if rec.traced():
                    return None
                terms.append((1.0, vec))
        return terms

    @staticmethod
    def _compute_broadband_sky(bb_term_name, params, coordinates):
        """Gaussian sky-residual broadband (reference:
        broadband_poly.py:119-145); sigma is a fit parameter so this stays
        a traced elementwise expression with a static support mask."""
        scale = params[bb_term_name + '-scale-sky']
        sigma = params[bb_term_name + '-sigma-sky']

        rt = jnp.asarray(coordinates.rt_grid)
        corr = scale / (sigma * jnp.sqrt(2. * jnp.pi))
        corr = corr * jnp.exp(-0.5 * (rt / sigma) ** 2)
        w = ((coordinates.rp_grid >= 0.)
             & (coordinates.rp_grid < coordinates.rp_binsize))
        return jnp.where(jnp.asarray(w), corr, 0.)
