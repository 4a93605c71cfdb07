"""Parameter metadata: default prior limits / step sizes, LaTeX labels.

Counterpart of the reference's vega/parameters/param_utils.py; the
defaults registry keeps the upstream semantics (same limits/steps) in a
restructured file format.
"""

from __future__ import annotations

from pathlib import Path

_PKG_DIR = Path(__file__).parent

COMPOSITES = {
    'bias': r'b_{',
    'bias_eta': r'b_{\eta,',
    'beta': r'\beta_{',
    'alpha': r'\alpha_{',
    'par_sigma_smooth': r'\sigma^{full}_{||,',
    'per_sigma_smooth': r'\sigma^{full}_{\bot,',
}


def get_default_values():
    """Default prior limits and minimizer step sizes
    (reference: param_utils.py:100-123)."""
    defaults = {}
    with open(_PKG_DIR / 'default_values.txt') as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith('#'):
                continue
            name, rest = line.split('=', 1)
            lo, hi, err = rest.split()
            defaults[name.strip()] = {
                'limits': (float(lo), float(hi)),
                'error': float(err),
            }
    return defaults


def get_latex(path):
    """Two-column name -> LaTeX mapping (reference: param_utils.py:66-99)."""
    latex_names = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line[0] == '#':
                continue
            items = line.split()
            latex_names[items[0]] = ' '.join(items[1:])
    return latex_names


def build_names(params):
    """LaTeX labels for parameter names, composing tracer subscripts when
    no full name exists (reference: param_utils.py:13-64)."""
    latex_full = get_latex(_PKG_DIR / 'latex_names.txt')
    latex_comp = get_latex(_PKG_DIR / 'latex_composite.txt')

    latex_names = {}
    for name in params:
        if name in latex_full:
            latex_names[name] = latex_full[name]
            continue

        tracer = None
        for subset in latex_comp:
            if subset.lower() in name.lower():
                tracer = subset
        comp_par = None
        for comp in COMPOSITES:
            if comp in name:
                comp_par = comp

        if tracer is not None and comp_par is not None:
            comp_name = comp_par + '_' + tracer
            latex_names[comp_name] = (COMPOSITES[comp_par]
                                      + latex_comp[tracer] + r'}')
        elif comp_par is not None:
            latex_names[name] = (COMPOSITES[comp_par]
                                 + name[len(comp_par) + 1:] + r'}')
        else:
            latex_names[name] = name

    return latex_names
