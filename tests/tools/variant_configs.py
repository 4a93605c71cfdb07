"""Model-feature config variants shared by the live-reference golden
generator (make_reference_variant_goldens.py) and the parity test
(tests/test_reference_variant_goldens.py).

Each variant starts from the reference's own test configuration
(/root/reference/tests/full_configs) and toggles one model-option axis
that the base config does not exercise: HCD fvoigt/sinc profiles
(reference power_spectrum.py:291-303), gaussian velocity dispersion
(power_spectrum.py:177-188), Croom QSO z-evolution
(correlation_func.py:316-371), McDonald small-scale NL
(power_spectrum.py:128-135), the aiso_epsilon / phi_alpha scale
parametrisations and smooth-scaling / full-shape-alpha modes
(scale_parameters.py:20-230), the old growth function
(correlation_func.py:71-79), and the relativistic/standard-asymmetry
cross terms (correlation_func.py:93-104, pktoxi.py:346-379).

Both frameworks read the SAME generated files, so any chi2 discrepancy
is a model discrepancy, not a config-interpretation one.
"""

import configparser
from pathlib import Path

REFERENCE = Path('/root/reference')
COMPONENTS = ['lyalya_lyalya', 'lyalya_lyalyb', 'lyalya_qso', 'lyalyb_qso']
CROSSES = ['lyalya_qso', 'lyalyb_qso']

# Variant spec fields:
#   model:      {selector: {key: value}} merged into each component's
#               [model] section. Selector 'all' hits every component,
#               'cross' only the qso crosses, else an exact name.
#   metals:     same shape, merged into [metals].
#   broadband:  same shape, merged into [broadband].
#   cosmo:      merged into main.ini's [cosmo-fit type].
#   params:     merged into main.ini's [parameters].
#   sample:     merged into main.ini's [sample] ("param = min max").
#   points:     parameter-override dicts evaluated for chi2/log_lik.
#   fit:        {names, bounds} — the golden generator additionally runs
#               a tightly-converged bounded scipy fit of the reference's
#               chi2 over these parameters and records (values, fval).
#   chi2_abs_tol: absolute chi2 tolerance override (default 2e-6 — the
#               measured model-vector floor of the refshims FFTLog
#               offset difference projected through the covariance at
#               chi2 ~ 0.65). Variants whose points amplify that SAME
#               floor — large residuals (delta_chi2 ~ 2*sqrt(chi2) *
#               |C^-1/2 dm|) or boosted metal biases (the metal-term
#               floor scales with the bias product) — document their
#               measured floor here; each stays well below the
#               variant's discriminating chi2 shift.
VARIANTS = {
    'hcd_fvoigt': {
        'model': {'all': {'model-hcd': 'fvoigt', 'fvoigt_model': 'exp'}},
        'points': [{}, {'ap': 1.05, 'at': 0.95, 'bias_hcd': -0.08,
                        'beta_hcd': 0.6, 'L0_fvoigt': 2.5}],
    },
    'hcd_sinc': {
        'model': {'all': {'model-hcd': 'sinc'}},
        'points': [{}, {'ap': 0.97, 'at': 1.04, 'bias_hcd': -0.04,
                        'L0_sinc': 8.0}],
    },
    'velo_gauss': {
        'model': {'cross': {'velocity dispersion': 'gauss'}},
        'metals': {'cross': {'velocity dispersion': 'gauss'}},
        'params': {'sigma_velo_disp_gauss_QSO': '5.2'},
        'points': [{}, {'ap': 1.06, 'at': 0.94,
                        'sigma_velo_disp_gauss_QSO': 7.1}],
    },
    'croom': {
        # Croom evolution is QSO-only (reference correlation_func.py:366
        # asserts tracer_name == 'QSO'), so the [metals] z evol — which
        # applies to the metal species themselves — stays standard.
        'model': {'cross': {'z evol QSO': 'croom'}},
        'params': {'croom_par0': '0.53', 'croom_par1': '0.289'},
        'points': [{}, {'ap': 1.03, 'at': 0.98, 'croom_par0': 0.48,
                        'croom_par1': 0.31}],
    },
    'dnl_mcdonald': {
        # McDonald NL asserts an LYAxLYA correlation (reference
        # power_spectrum.py:427-428); other components keep Arinyo.
        'model': {'lyalya_lyalya': {'small scale nl': 'dnl_mcdonald'}},
        'points': [{}, {'ap': 1.08, 'at': 0.91, 'bias_eta_LYA': -0.19}],
    },
    'aiso_epsilon': {
        'cosmo': {'cosmo fit func': 'aiso_epsilon'},
        'params': {'aiso': '1.0', 'epsilon': '0.0'},
        'points': [{'aiso': 1.02, 'epsilon': 0.015},
                   {'aiso': 0.96, 'epsilon': -0.03, 'beta_LYA': 1.5}],
        # tightly-converged live-reference fit in THIS parametrisation
        # (scipy L-BFGS-B on the reference's chi2, same recipe as
        # make_reference_goldens.py) — extends the fit-parity oracle
        # beyond ap_at. 'sample' is merged into main.ini's [sample] so
        # vega_tpu's own minimizer fits the same problem.
        'fit': {'names': ['aiso', 'epsilon', 'bias_eta_LYA', 'beta_LYA'],
                'bounds': {'aiso': (0.8, 1.2), 'epsilon': (-0.1, 0.1),
                           'bias_eta_LYA': (-2.0, 0.0),
                           'beta_LYA': (0.0, 3.0)}},
        'sample': {'aiso': '0.8 1.2', 'epsilon': '-0.1 0.1'},
    },
    'phi_alpha': {
        'cosmo': {'cosmo fit func': 'phi_alpha'},
        'params': {'phi': '1.0', 'alpha': '1.0'},
        'points': [{'phi': 1.04, 'alpha': 0.97},
                   {'phi': 0.93, 'alpha': 1.05, 'bias_eta_LYA': -0.22}],
        'fit': {'names': ['phi', 'alpha', 'bias_eta_LYA', 'beta_LYA'],
                'bounds': {'phi': (0.8, 1.2), 'alpha': (0.8, 1.2),
                           'bias_eta_LYA': (-2.0, 0.0),
                           'beta_LYA': (0.0, 3.0)}},
        'sample': {'phi': '0.8 1.2', 'alpha': '0.8 1.2'},
    },
    'smooth_scaling': {
        'cosmo': {'cosmo fit func': 'phi_alpha', 'smooth-scaling': 'True'},
        'params': {'phi': '1.0', 'alpha': '1.0', 'phi_smooth': '1.0',
                   'alpha_smooth': '1.0'},
        'points': [{'phi': 1.03, 'alpha': 0.98, 'phi_smooth': 1.06,
                    'alpha_smooth': 0.95},
                   {'phi_smooth': 0.92, 'alpha_smooth': 1.04}],
        # fit over the SMOOTH-component scaling (peak phi/alpha stay at
        # the config values): exercises the peak/smooth routing of
        # scale_parameters under the fit, not just at points
        'fit': {'names': ['phi_smooth', 'alpha_smooth', 'bias_eta_LYA',
                          'beta_LYA'],
                'bounds': {'phi_smooth': (0.8, 1.2),
                           'alpha_smooth': (0.8, 1.2),
                           'bias_eta_LYA': (-2.0, 0.0),
                           'beta_LYA': (0.0, 3.0)}},
        'sample': {'phi_smooth': '0.8 1.2', 'alpha_smooth': '0.8 1.2'},
    },
    'fullshape_alpha': {
        'cosmo': {'full-shape': 'True', 'full-shape-alpha': 'True'},
        'params': {'ap_full': '1.0', 'at_full': '1.0'},
        'points': [{'ap_full': 1.04, 'at_full': 0.96},
                   {'ap_full': 0.95, 'at_full': 1.07, 'beta_LYA': 1.8}],
        'fit': {'names': ['ap_full', 'at_full', 'bias_eta_LYA',
                          'beta_LYA'],
                'bounds': {'ap_full': (0.8, 1.2), 'at_full': (0.8, 1.2),
                           'bias_eta_LYA': (-2.0, 0.0),
                           'beta_LYA': (0.0, 3.0)}},
        # full "min max start step" spec: ap_full/at_full have no
        # default-registry entry in either framework
        'sample': {'ap_full': '0.8 1.2 1.0 0.01',
                   'at_full': '0.8 1.2 1.0 0.01'},
    },
    'growth_old_rel_asym': {
        'model': {'all': {'old_growth_func': 'True'},
                  'cross': {'relativistic correction': 'True',
                            'standard asymmetry': 'True'}},
        'params': {'Arel1': '-13.5', 'Arel3': '1.0', 'Aasy0': '2.0',
                   'Aasy2': '1.0', 'Aasy3': '1.5'},
        'points': [{}, {'ap': 1.05, 'at': 0.95, 'Arel1': -10.0,
                        'Aasy0': 1.2}],
    },
    'uv_shotnoise': {
        # UV background shot noise A(tau) term (reference
        # correlation_func.py:110-111, 649-686); bias_gamma/bias_prim/
        # lambda_uv come from the base UVB-fluctuations parameters.
        'model': {'all': {'UVB-shotnoise': 'True'}},
        'params': {'uv_shotnoise_amp': '1.0'},
        'points': [{}, {'uv_shotnoise_amp': 1.6, 'lambda_uv': 250.0,
                        'ap': 1.04, 'at': 0.97}],
        # chi2 ~ 721 here (the shot-noise term moves the model far off
        # the data): the base-config floor delta-m (measured bit-equal
        # to the base run's) projects to delta-chi2 ~ 2e-5 through the
        # large residuals. Signal: +7.2e+2 vs base.
        'chi2_abs_tol': 8e-5,
    },
    'heii': {
        # HeII reionization effective-bias shift stacked on top of the
        # base UVB term (reference power_spectrum.py:251-258).
        'model': {'all': {'HeII-reionization': 'True'}},
        'params': {'bias_gamma_e': '0.08', 'lambda_HeII': '100.0'},
        'points': [{}, {'bias_gamma_e': 0.12, 'lambda_HeII': 80.0,
                        'ap': 0.96, 'at': 1.03}],
    },
    'fullshape_exp': {
        # gauss+exp full-shape smoothing (reference
        # power_spectrum.py:560-586); sigma params exist in the base.
        'model': {'all': {'fullshape smoothing': 'exp'}},
        'params': {'par_exp_smooth': '2.0', 'per_exp_smooth': '2.0'},
        'points': [{}, {'par_exp_smooth': 3.1, 'per_exp_smooth': 1.4,
                        'par_sigma_smooth': 2.5}],
        # measured floor 2.8e-6 at the stronger-smoothing point
        # (model-vector maxabs 2.3e-6 vs base 1.8e-6). Signal: -1e-3.
        'chi2_abs_tol': 8e-6,
    },
    'broadband_sky': {
        # Gaussian rt sky-residual broadband as bb index 1 of
        # lyalya_lyalya (reference broadband_poly.py:50-53, 119-145).
        'broadband': {'lyalya_lyalya':
                      {'bb2': 'add post rp,rt 0:0:1 0:0:1 broadband_sky'}},
        'params': {'BB-lyalya_lyalya-1-broadband_sky-scale-sky': '0.00896',
                   'BB-lyalya_lyalya-1-broadband_sky-sigma-sky': '32.7'},
        'points': [{}, {'BB-lyalya_lyalya-1-broadband_sky-scale-sky': 0.02,
                        'BB-lyalya_lyalya-1-broadband_sky-sigma-sky': 25.0}],
    },
    'metal_scaling': {
        # BAO scaling applied to metal correlations too (reference
        # scale_parameters.py:23, 55-56). Needs no-metal-decomp=False:
        # with the default single-'full' metal pass, pars['peak'] is
        # False and metal-scaling routes to default() regardless
        # (model.py:74,181-184 + scale_parameters.py:55-64). The point
        # boosts metal biases and bao_amp so the peak-metal rescale is
        # well above the shim floor (measured chi2 delta 3e-4 between
        # metal-scaling on/off).
        'cosmo': {'metal-scaling': 'True'},
        'model': {'all': {'no-metal-decomp': 'False'}},
        'points': [{}, {'ap': 1.15, 'at': 0.85, 'bao_amp': 3.0,
                        'bias_eta_SiIII(1207)': -0.08,
                        'bias_eta_SiII(1260)': -0.06,
                        'bias_eta_SiII(1190)': -0.06,
                        'bias_eta_SiII(1193)': -0.05,
                        'bias_eta_CIV(eff)': -0.1}],
        # BAO fit with the metal rescale ACTIVE: the (ap, at) minimum
        # must match with the peak-metal terms rescaling too
        'fit': {'names': ['ap', 'at', 'bias_eta_LYA', 'beta_LYA'],
                'bounds': {'ap': (0.8, 1.2), 'at': (0.8, 1.2),
                           'bias_eta_LYA': (-2.0, 0.0),
                           'beta_LYA': (0.0, 3.0)}},
        'sample': {'ap': '0.8 1.2', 'at': '0.8 1.2'},
        # the 15-25x boosted metal biases scale the metal-term FFTLog
        # floor with them: measured model-vector maxabs 1.4e-5
        # (vs 1.8e-6 base), delta-chi2 1.9e-5 — still 6x below the
        # 3e-4 metal-scaling on/off signal at this point.
        'chi2_abs_tol': 6e-5,
    },
    'two_alpha_smooth': {
        # Per-correlation smooth-component alpha (reference
        # scale_parameters.py:24, 155-157): phi_alpha + smooth-scaling
        # with alpha_smooth_{corr_name}, where corr_name is the tracer
        # pair '{t1}x{t2}' (correlation_func.py:54) — LYAxLYA for both
        # autos, LYAxQSO for both crosses.
        'cosmo': {'cosmo fit func': 'phi_alpha', 'smooth-scaling': 'True',
                  'two-alpha-smooth': 'True'},
        'params': {'phi': '1.0', 'alpha': '1.0', 'phi_smooth': '1.0',
                   'alpha_smooth_LYAxLYA': '1.0',
                   'alpha_smooth_LYAxQSO': '1.0'},
        'points': [{'phi': 1.02, 'alpha': 0.99,
                    'alpha_smooth_LYAxLYA': 1.04,
                    'alpha_smooth_LYAxQSO': 0.95},
                   {'phi_smooth': 0.97, 'alpha_smooth_LYAxLYA': 1.06,
                    'alpha_smooth_LYAxQSO': 0.93}],
        'fit': {'names': ['alpha_smooth_LYAxLYA', 'alpha_smooth_LYAxQSO',
                          'bias_eta_LYA', 'beta_LYA'],
                'bounds': {'alpha_smooth_LYAxLYA': (0.8, 1.2),
                           'alpha_smooth_LYAxQSO': (0.8, 1.2),
                           'bias_eta_LYA': (-2.0, 0.0),
                           'beta_LYA': (0.0, 3.0)}},
        'sample': {'alpha_smooth_LYAxLYA': '0.8 1.2 1.0 0.01',
                   'alpha_smooth_LYAxQSO': '0.8 1.2 1.0 0.01'},
    },
    'bao_scan': {
        # No model toggles — the BASE config with (ap, at) sampled.
        # Carries a 'scan' spec: a 1D profile-likelihood scan over ap
        # (the reference's Analysis.chi2_scan semantics, reference
        # analysis.py:53-124 — fix the scanned parameter, re-minimize
        # every other sampled parameter) recorded from the live
        # reference, certifying vega_tpu's L5 scan driver end to end.
        'sample': {'ap': '0.8 1.2', 'at': '0.8 1.2'},
        'points': [{'ap': 1.033, 'at': 1.002}],
        'scan': {'param': 'ap',
                 # == np.linspace(0.96, 1.08, 4): expressible as the
                 # "start end n" grid of a [chi2 scan] config section
                 'grid': [0.96, 1.0, 1.04, 1.08],
                 'minimize': ['at', 'bias_eta_LYA', 'beta_LYA'],
                 'bounds': {'at': (0.8, 1.2),
                            'bias_eta_LYA': (-2.0, 0.0),
                            'beta_LYA': (0.0, 3.0)}},
    },
    'bao_scan2d': {
        # 2D (ap, at) profile grid — the BAO-paper confidence-contour
        # deliverable — re-minimizing (bias_eta, beta) at each of the
        # 3x3 points, in the reference's C order (itertools.product:
        # first param = outer loop, reference analysis.py:96-101).
        'sample': {'ap': '0.8 1.2', 'at': '0.8 1.2'},
        'points': [{'ap': 1.033, 'at': 1.002, 'bias_eta_LYA': -0.2054}],
        'scan': {'params': ['ap', 'at'],
                 'grids': {'ap': [0.97, 1.02, 1.07],
                           'at': [0.95, 1.0, 1.05]},
                 'minimize': ['bias_eta_LYA', 'beta_LYA'],
                 'bounds': {'bias_eta_LYA': (-2.0, 0.0),
                            'beta_LYA': (0.0, 3.0)}},
    },
    'pk_damping_nogk': {
        # hi-k damping exp(-(k/k0)^n / 2) (reference
        # power_spectrum.py:50-51, 190-196) with the G(k) binning window
        # disabled (model binning, power_spectrum.py:45) — two
        # independent multiplicative axes in one variant.
        'model': {'lyalya_lyalya': {'pk-damping-scale': '10.0',
                                    'pk-damping-power': '4'},
                  'all': {'model binning': 'False'}},
        'points': [{}, {'ap': 1.03, 'at': 0.96, 'bias_eta_LYA': -0.21}],
    },
    'desi_syst': {
        # DESI instrumental-systematics additive correction from the
        # shipped CSV table (reference correlation_func.py:553-595,
        # model.py:76-77,132-135); auto-correlations only.
        'model': {'lyalya_lyalya':
                  {'desi-instrumental-systematics': 'True'},
                  'lyalya_lyalyb':
                  {'desi-instrumental-systematics': 'True'}},
        'points': [{}, {'desi_inst_sys_amp': 0.0006}],
    },
}


def _parser():
    config = configparser.ConfigParser()
    config.optionxform = lambda option: option
    return config


def build_variant(name, out_dir):
    """Write the variant's component INIs + main INI into out_dir.

    Data/metal file paths stay relative, so the caller must run with
    cwd = /root/reference/tests (as the base configs expect). Returns
    the path of the generated main INI.
    """
    spec = VARIANTS[name]
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    component_paths = []
    for comp in COMPONENTS:
        config = _parser()
        config.read(REFERENCE / 'tests' / 'full_configs' / f'{comp}.ini')
        for scope in ('model', 'metals', 'broadband'):
            for selector, overrides in spec.get(scope, {}).items():
                selected = (selector == 'all'
                            or (selector == 'cross' and comp in CROSSES)
                            or selector == comp)
                if selected and config.has_section(scope):
                    for key, value in overrides.items():
                        config[scope][key] = value
        path = out_dir / f'{comp}.ini'
        with open(path, 'w') as f:
            config.write(f)
        component_paths.append(str(path))

    main = _parser()
    main.read(REFERENCE / 'tests' / 'full_configs' / 'main.ini')
    main['data sets']['ini files'] = ' '.join(component_paths)
    for key, value in spec.get('cosmo', {}).items():
        main['cosmo-fit type'][key] = value
    for key, value in spec.get('params', {}).items():
        main['parameters'][key] = value
    for key, value in spec.get('sample', {}).items():
        main['sample'][key] = value
    main_path = out_dir / 'main.ini'
    with open(main_path, 'w') as f:
        main.write(f)
    return main_path
