"""Correlation-function data handling: data vectors, covariances,
distortion and metal matrices, Monte-Carlo mock generation, small-scale
marginalization templates.

Counterpart of the reference's vega/data.py with two structural changes:
- FITS I/O goes through the internal pure-numpy reader (vega_tpu.io.fits).
- Sparse scipy matrices (distortion, metal) become dense f64 arrays: on
  TPU these are MXU matmuls and the ~2500^2-5000^2 sizes are trivially
  fast dense; sparsity buys nothing.
"""

from __future__ import annotations

import numpy as np

from .coordinates import Coordinates
from .io.fits import read_fits
from .utils import compute_log_cov_det, compute_masked_invcov, find_file

BLINDING_STRATEGIES = ['desi_dr3']


class Data:
    """Data for one correlation component (reference: data.py:12-134)."""

    _data_vec = None
    _masked_data_vec = None
    _cov_mat = None
    _distortion_mat = None
    _inv_masked_cov = None
    _log_cov_det = None
    _blind = None
    _blinding_strat = None
    cosmo_params = None
    dist_model_coordinates = None
    model_coordinates = None
    data_coordinates = None

    def __init__(self, corr_item, marginalize_in_fit=False):
        self.corr_item = corr_item
        self.tracer1 = corr_item.tracer1
        self.tracer2 = corr_item.tracer2
        self.use_metal_autos = corr_item.config['model'].getboolean(
            'use_metal_autos', True)
        self.cholesky_masked_cov = corr_item.config['data'].getboolean(
            'cholesky-masked-cov', True)

        data_path = corr_item.config['data'].get('filename')
        dmat_path = corr_item.config['data'].get('distortion-file', None)
        cov_path = corr_item.config['data'].get('covariance-file', None)
        cov_rescale = corr_item.config['data'].getfloat('cov_rescale', None)

        self._read_data(data_path, corr_item.config['cuts'], dmat_path,
                        cov_path, cov_rescale)
        self.corr_item.init_coordinates(
            self.model_coordinates, self.dist_model_coordinates,
            self.data_coordinates)

        if 'metals' in corr_item.config:
            if not corr_item.new_metals:
                tracer_catalog, metal_correlations = self._init_metals(
                    corr_item.config['metals'])
            else:
                in1, in2, tracer_catalog = self._init_metal_tracers(
                    corr_item.config['metals'])
                metal_correlations = self._init_metal_correlations(
                    corr_item.config['metals'], in1, in2)
            self.corr_item.init_metals(tracer_catalog, metal_correlations)

        if 'broadband' in corr_item.config:
            self.corr_item.init_broadband(self.coeff_binning_model)

        if self.cosmo_params is not None:
            self.corr_item.init_cosmo(self.cosmo_params)

        if not self.has_distortion:
            self._distortion_mat = np.eye(self.full_data_size)
        if not self.has_cov_mat and not self.corr_item.low_mem_mode:
            self._cov_mat = np.eye(self.full_data_size)

        if self.corr_item.low_mem_mode:
            self.variance = np.ones(self.full_data_size)
        else:
            self.variance = self.cov_mat.diagonal().copy()

        self.cov_mat_org = None
        self.marg_templates = None
        self.cov_marg_update = None
        self.marg_diff2coeff_matrix = None
        self.num_marg_modes = 0
        if not self.corr_item.low_mem_mode:
            self.cov_mat_org = self.cov_mat.copy()

        # Small-scale marginalization setup (reference: data.py:96-128)
        if corr_item.marginalize_small_scales:
            self.marg_templates, self.cov_marg_update = \
                self.get_dist_xi_marg_templates()

            ntemps = self.marg_templates.shape[1]

            self._inv_masked_cov = None
            _inv_masked_cov = self.inv_masked_cov
            self._inv_masked_cov = None

            if not marginalize_in_fit:
                self._cov_mat[np.ix_(self.data_mask, self.data_mask)] += \
                    self.cov_marg_update
            else:
                self.cov_marg_update = None

            templates_masked = self.marg_templates[self.model_mask, :]
            g_mat = templates_masked.T.dot(_inv_masked_cov)
            a_mat = templates_masked.T.dot(g_mat.T).T

            if not (self.corr_item.fit_marg_scales
                    and self.corr_item.marginalize_match_data_bins):
                prior = self.corr_item.marginalize_small_scales_prior_sigma
                a_mat = a_mat + np.diag(np.full(ntemps, prior ** -2))

            self.marg_diff2coeff_matrix = np.linalg.inv(a_mat).dot(g_mat)

        self._cholesky = None
        self._scale = 1.
        self.scaled_inv_masked_cov = None
        self.scaled_log_cov_det = None
        self.effective_data_size = self.data_size - self.num_marg_modes

    # ------------------------------------------------------------------
    # Properties (reference: data.py:136-283)
    # ------------------------------------------------------------------
    @property
    def blind(self):
        return self._blind

    @property
    def blinding_strat(self):
        return self._blinding_strat

    @property
    def data_vec(self):
        return self._data_vec

    @property
    def masked_data_vec(self):
        if self._masked_data_vec is None:
            self._masked_data_vec = self.data_vec[self.data_mask]
        return self._masked_data_vec

    @property
    def data_size(self):
        return self.masked_data_vec.size

    @property
    def cov_mat(self):
        if self._cov_mat is None:
            raise AttributeError(
                'No covariance matrix found. Check the data file: ',
                self.corr_item.config['data'].get('filename'))
        return self._cov_mat

    @property
    def distortion_mat(self):
        if self._distortion_mat is None:
            raise AttributeError(
                'No distortion matrix found. Check the data file: ',
                self.corr_item.config['data'].get('filename'))
        return self._distortion_mat

    @property
    def inv_masked_cov(self):
        if self._inv_masked_cov is None:
            self._inv_masked_cov = compute_masked_invcov(
                self.cov_mat, self.data_mask)
        return self._inv_masked_cov

    @property
    def log_cov_det(self):
        if self._log_cov_det is None:
            self._log_cov_det = compute_log_cov_det(
                self.cov_mat, self.data_mask)
        return self._log_cov_det

    @property
    def has_cov_mat(self):
        return self._cov_mat is not None

    @property
    def has_cov_mat_org(self):
        return self.cov_mat_org is not None

    @property
    def has_distortion(self):
        return self._distortion_mat is not None

    # ------------------------------------------------------------------
    # Reading (reference: data.py:285-473)
    # ------------------------------------------------------------------
    def _read_data(self, data_path, cuts_config, dmat_path=None,
                   cov_path=None, cov_rescale=None):
        print(f'Reading data file {data_path}')
        hdul = read_fits(find_file(data_path))
        header = hdul[1].header
        columns = hdul[1].columns

        self._blinding_strat = None
        if 'BLINDING' in header:
            self._blinding_strat = header['BLINDING']
            if self._blinding_strat in ('none', 'None'):
                self._blinding_strat = None

        if self._blinding_strat in BLINDING_STRATEGIES:
            print(f'Strategy: {self._blinding_strat}')
            self._blind = True
            if self._blinding_strat == 'desi_dr3':
                assert 'DA_BLIND' in columns, 'Blinding failed, do not run!!!'
            if 'DA_BLIND' in columns:
                print(f'Warning! Running on blinded data {data_path}')
                self._data_vec = columns['DA_BLIND'].astype(float)
            elif 'DA' in columns:
                self._data_vec = columns['DA'].astype(float)
            else:
                raise ValueError('No DA or DA_BLIND column in data file.')
        elif self._blinding_strat is None:
            self._blind = False
            self._data_vec = columns['DA'].astype(float)
        elif self._blinding_strat in ['desi_m2', 'desi_y1', 'desi_y3']:
            self._blind = False
            self._data_vec = columns['DA'].astype(float)
        else:
            self._blind = True
            raise ValueError(
                f'Unknown blinding strategy {self._blinding_strat}.')

        if dmat_path is None:
            if 'DM_BLIND' in columns:
                self._distortion_mat = columns['DM_BLIND'].astype(float)
            elif 'DM' in columns:
                self._distortion_mat = columns['DM'].astype(float)

        if cov_path is not None:
            print(f'Reading covariance matrix file {cov_path}')
            cov_hdul = read_fits(find_file(cov_path))
            self._cov_mat = cov_hdul[1]['CO'].astype(float)
        elif 'CO' in columns:
            self._cov_mat = columns['CO'].astype(float)

        if cov_rescale is not None and self._cov_mat is not None:
            self._cov_mat = self._cov_mat * cov_rescale

        if 'OMEGAM' in header:
            self.cosmo_params = {
                'Omega_m': header['OMEGAM'],
                'Omega_k': header.get('OMEGAK', 0.),
                'Omega_r': header.get('OMEGAR', 0.),
                'wl': header.get('WL', -1.),
            }

        self.nb = columns['NB'] if 'NB' in columns else None

        self.data_coordinates = Coordinates(
            header['RPMIN'], header['RPMAX'], header['RTMAX'],
            header['NP'], header['NT'],
            rp_grid=columns['RP'], rt_grid=columns['RT'],
            z_grid=columns['Z'])

        if dmat_path is None:
            if len(hdul) > 2:
                self.model_coordinates = Coordinates(
                    header['RPMIN'], header['RPMAX'], header['RTMAX'],
                    header['NP'], header['NT'],
                    rp_grid=hdul[2]['DMRP'], rt_grid=hdul[2]['DMRT'],
                    z_grid=hdul[2]['DMZ'])
            self.coeff_binning_model = 1

        self.data_mask = self.data_coordinates.get_mask_scale_cuts(cuts_config)

        if dmat_path is not None:
            self._read_dmat(dmat_path)

        if self.model_coordinates is None:
            self.model_coordinates = self.data_coordinates
        if self.dist_model_coordinates is None:
            self.dist_model_coordinates = self.model_coordinates

        self.model_mask = self.dist_model_coordinates.get_mask_scale_cuts(
            cuts_config)
        self.full_data_size = len(self.data_vec)

        self.r_min_cut = cuts_config.getfloat('r-min', 10.)
        self.r_max_cut = cuts_config.getfloat('r-max', 180.)
        self.mu_min_cut = cuts_config.getfloat('mu-min', -1.)
        self.mu_max_cut = cuts_config.getfloat('mu-max', +1.)

    def _check_if_blinding_matches(self, blinding_flag, dmat_path):
        if self._blinding_strat is None:
            if blinding_flag not in ('none', 'None'):
                print(f'Warning: Data has no blinding, but distortion matrix '
                      f'at {dmat_path} has a blinding flag {blinding_flag}')
        elif self._blinding_strat != blinding_flag:
            print(f'Warning: Data blinding flag does not match the '
                  f'distortion matrix at {dmat_path} ({blinding_flag})')

    def _read_dmat(self, dmat_path):
        """Separate distortion-matrix file (reference: data.py:441-473)."""
        print(f'Reading distortion matrix file {dmat_path}')
        hdul = read_fits(find_file(dmat_path))
        header = hdul[1].header

        if 'BLINDING' in header:
            self._check_if_blinding_matches(header['BLINDING'], dmat_path)

        if 'DM' in hdul[1].columns:
            self._distortion_mat = hdul[1]['DM'].astype(float)
        elif 'DM_BLIND' in hdul[1].columns:
            self._distortion_mat = hdul[1]['DM_BLIND'].astype(float)
        else:
            raise ValueError('No DM or DM_BLIND column in distortion file.')

        self.coeff_binning_model = header['COEFMOD']
        self.model_coordinates = Coordinates(
            header['RPMIN'], header['RPMAX'], header['RTMAX'],
            header['NP'] * self.coeff_binning_model,
            header['NT'] * self.coeff_binning_model,
            rp_grid=hdul[2]['RP'], rt_grid=hdul[2]['RT'], z_grid=hdul[2]['Z'])
        self.dist_model_coordinates = Coordinates(
            header['RPMIN'], header['RPMAX'], header['RTMAX'],
            header['NP'], header['NT'])

    # ------------------------------------------------------------------
    # Metals (reference: data.py:475-687)
    # ------------------------------------------------------------------
    def _init_metal_tracers(self, metal_config):
        assert ('in tracer1' in metal_config) or ('in tracer2' in metal_config), \
            "The metals config must specify 'in tracer1' and/or 'in tracer2'"
        metals_in_tracer1 = None
        metals_in_tracer2 = None
        if 'in tracer1' in metal_config:
            metals_in_tracer1 = metal_config.get('in tracer1').split()
        if 'in tracer2' in metal_config:
            metals_in_tracer2 = metal_config.get('in tracer2').split()

        tracer_catalog = {
            self.tracer1['name']: self.tracer1,
            self.tracer2['name']: self.tracer2,
        }
        for metals in (metals_in_tracer1, metals_in_tracer2):
            if metals is not None:
                for metal in metals:
                    tracer_catalog[metal] = {'name': metal,
                                             'type': 'continuous'}
        return metals_in_tracer1, metals_in_tracer2, tracer_catalog

    def _init_metal_correlations(self, metal_config, in1, in2):
        metal_correlations = []
        if 'in tracer2' in metal_config:
            for metal in in2:
                if self._use_correlation(self.tracer1['name'], metal):
                    metal_correlations.append((self.tracer1['name'], metal))
        if 'in tracer1' in metal_config:
            for metal in in1:
                if self._use_correlation(metal, self.tracer2['name']):
                    metal_correlations.append((metal, self.tracer2['name']))
        if ('in tracer1' in metal_config) and ('in tracer2' in metal_config):
            for i, metal1 in enumerate(in1):
                j0 = i if self.tracer1 == self.tracer2 else 0
                for metal2 in in2[j0:]:
                    if self._use_correlation(metal1, metal2):
                        metal_correlations.append((metal1, metal2))
        return metal_correlations

    def _init_metals(self, metal_config):
        in1, in2, tracer_catalog = self._init_metal_tracers(metal_config)

        self.metal_mats = {}
        self.metal_coordinates = {}

        metal_hdul = read_fits(find_file(metal_config.get('filename')))

        dm_prefix = 'DM_'
        if 'BLINDING' in metal_hdul[1].header:
            if metal_hdul[1].header['BLINDING'] != 'none':
                dm_prefix = 'DM_BLIND_'

        metal_correlations = []
        if 'in tracer2' in metal_config:
            for metal in in2:
                if not self._use_correlation(self.tracer1['name'], metal):
                    continue
                tracers = (self.tracer1['name'], metal)
                name = self.tracer1['name'] + '_' + metal
                if 'RP_' + name not in metal_hdul[2].columns:
                    name = metal + '_' + self.tracer1['name']
                self._read_metal_correlation(metal_hdul, tracers, name,
                                             dm_prefix)
                metal_correlations.append(tracers)

        if 'in tracer1' in metal_config:
            for metal in in1:
                if not self._use_correlation(metal, self.tracer2['name']):
                    continue
                tracers = (metal, self.tracer2['name'])
                name = metal + '_' + self.tracer2['name']
                if 'RP_' + name not in metal_hdul[2].columns:
                    name = self.tracer2['name'] + '_' + metal
                self._read_metal_correlation(metal_hdul, tracers, name,
                                             dm_prefix)
                metal_correlations.append(tracers)

        if ('in tracer1' in metal_config) and ('in tracer2' in metal_config):
            for i, metal1 in enumerate(in1):
                j0 = i if self.tracer1 == self.tracer2 else 0
                for metal2 in in2[j0:]:
                    if not self._use_correlation(metal1, metal2):
                        continue
                    tracers = (metal1, metal2)
                    name = metal1 + '_' + metal2
                    if 'RP_' + name not in metal_hdul[2].columns:
                        name = metal2 + '_' + metal1
                    self._read_metal_correlation(metal_hdul, tracers, name,
                                                 dm_prefix)
                    metal_correlations.append(tracers)

        return tracer_catalog, metal_correlations

    def _use_correlation(self, name1, name2):
        """(reference: data.py:632-653)"""
        if name1 == 'CIV(eff)' or name2 == 'CIV(eff)':
            return name1 == name2
        if 'SiII' in name1 and 'SiII' in name2 and not self.use_metal_autos:
            return False
        return True

    def _read_metal_correlation(self, metal_hdul, tracers, name, dm_prefix):
        """(reference: data.py:655-687)"""
        header = metal_hdul[1].header
        self.metal_coordinates[tracers] = Coordinates(
            header['RPMIN'], header['RPMAX'], header['RTMAX'],
            header['NP'], header['NT'],
            rp_grid=metal_hdul[2]['RP_' + name],
            rt_grid=metal_hdul[2]['RT_' + name],
            z_grid=metal_hdul[2]['Z_' + name])

        metal_mat_size = self.metal_coordinates[tracers].rp_grid.size
        dm_name = dm_prefix + name
        if dm_name in metal_hdul[2].columns:
            self.metal_mats[tracers] = metal_hdul[2][dm_name].astype(float)
        elif len(metal_hdul) > 3 and dm_name in metal_hdul[3].columns:
            self.metal_mats[tracers] = metal_hdul[3][dm_name].astype(float)
        elif self.corr_item.test_flag:
            # identity metal matrix: flagged as None so the model can skip
            # the matmul entirely (the reference multiplies by sparse.eye)
            self.metal_mats[tracers] = None
        else:
            raise ValueError('Cannot find correct metal matrices. Check that '
                             'blinding is consistent between cf and metal '
                             'files.')
        del metal_mat_size

    # ------------------------------------------------------------------
    # Monte Carlo (reference: data.py:689-760)
    # ------------------------------------------------------------------
    def create_monte_carlo(self, fiducial_model, scale=None, seed=None,
                           forecast=False):
        """Cholesky mock of the data; host-side twin of the vmapped device
        path in analysis.py."""
        if scale is None:
            scale = 1

        if np.isclose(scale, self._scale):
            self._recompute = False
        else:
            self._scale = scale
            self._recompute = True
            self.scaled_inv_masked_cov = self.inv_masked_cov / self._scale
            self.scaled_log_cov_det = np.log(self._scale) + self.log_cov_det

        if self.scaled_inv_masked_cov is None:
            self.scaled_inv_masked_cov = self.inv_masked_cov
        if self.scaled_log_cov_det is None:
            self.scaled_log_cov_det = self.log_cov_det

        if (self._cholesky is None or self._recompute) and not forecast:
            if self.cholesky_masked_cov:
                masked_cov = self.cov_mat[np.ix_(self.data_mask,
                                                 self.data_mask)]
                self._cholesky = np.linalg.cholesky(self._scale * masked_cov)
            else:
                self._cholesky = np.linalg.cholesky(self._scale * self.cov_mat)

        if seed is not None:
            np.random.seed(seed)

        masked_fiducial = fiducial_model
        if fiducial_model.size != self.full_data_size:
            if fiducial_model.size != self.dist_model_coordinates.rp_grid.size:
                raise ValueError(
                    'Could not match fiducial model to data or model size.')
            mask = self.dist_model_coordinates.get_mask_to_other(
                self.data_coordinates)
            masked_fiducial = fiducial_model[mask]

        if forecast:
            self.mc_mock = masked_fiducial
        else:
            self.mc_mock = np.full(self.full_data_size, np.nan)
            if self.cholesky_masked_cov:
                ran_vec = np.random.randn(self.data_mask.sum())
                self.mc_mock[self.data_mask] = (
                    masked_fiducial[self.data_mask]
                    + self._cholesky.dot(ran_vec))
            else:
                ran_vec = np.random.randn(self.full_data_size)
                self.mc_mock = masked_fiducial + self._cholesky.dot(ran_vec)

        self.masked_mc_mock = self.mc_mock[self.data_mask]
        return self.mc_mock

    # ------------------------------------------------------------------
    # Small-scale marginalization (reference: data.py:762-828)
    # ------------------------------------------------------------------
    def get_dist_xi_marg_templates(self, factor=1e-8, return_AAT=True):
        if not self.corr_item.marginalize_small_scales:
            raise ValueError('Marginalization not configured')
        if not self.has_distortion:
            raise ValueError('Distortion matrix required for marginalization')

        templates = self.corr_item.get_undist_xi_marg_templates()
        templates = self.distortion_mat.dot(templates)

        if self.corr_item.fit_marg_scales:
            self.data_mask |= \
                self.data_coordinates.get_mask_marginalization_scales(
                    self.corr_item.config['cuts'],
                    self.corr_item.marginalize_small_scales)
            self.model_mask |= \
                self.dist_model_coordinates.get_mask_marginalization_scales(
                    self.corr_item.config['cuts'],
                    self.corr_item.marginalize_small_scales)
            if self.data_mask.sum() != self.model_mask.sum():
                raise ValueError(
                    'Data and model masks should be the same after '
                    'marginalization scale cuts. Check rp-min for '
                    'cross-correlations.')
            self._masked_data_vec = None
            _ = self.masked_data_vec

        if not return_AAT:
            return templates

        t = templates * self.corr_item.marginalize_small_scales_prior_sigma
        t = t[self.model_mask, :]
        print(f'  There are {templates.shape[1]} templates. '
              'SVD of template matrix to remove degenerate modes.')
        u, s, _ = np.linalg.svd(t, full_matrices=False)
        w = s > factor * s[0]
        u = u[:, w]
        s = s[w]
        print(f'  There are {w.sum()} remaining modes for marginalization.')
        self.num_marg_modes = int(w.sum())
        cov_update = np.dot(u * s ** 2, u.T)
        return templates, cov_update
