#!/usr/bin/env python
"""Run the ACTUAL reference (/root/reference) through the dependency
shims on each model-feature config variant (variant_configs.py) and
record chi2/log_lik goldens for vega_tpu's variant parity tests.

This extends the live-reference parity surface beyond the base
main.ini feature set: HCD fvoigt/sinc, gaussian velocity dispersion,
Croom z-evolution, McDonald NL, aiso_epsilon/phi_alpha/smooth-scaling/
full-shape-alpha scale modes, old growth, relativistic + standard
asymmetry.

Usage:  python tests/tools/make_reference_variant_goldens.py \
            [--only name1,name2] [out.json]

Existing goldens in the output file are kept; only the selected (or
missing) variants are regenerated and merged in.
"""

import json
import os
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
REFERENCE = Path(os.environ.get('VEGA_REFERENCE', '/root/reference'))

sys.path.insert(0, str(REPO / 'tests' / 'tools'))
from variant_configs import VARIANTS, build_variant  # noqa: E402


def main(out_path=None, only=None):
    sys.path.insert(0, str(REPO / 'tests' / 'refshims'))
    sys.path.insert(0, str(REFERENCE))

    os.chdir(REFERENCE / 'tests')
    from vega import VegaInterface

    out = Path(out_path) if out_path else (
        REPO / 'tests' / 'data' / 'reference_variant_goldens.json')
    goldens = json.loads(out.read_text()) if out.exists() else {}
    todo = ([v.strip() for v in only.split(',')] if only
            else [v for v in VARIANTS if v not in goldens])
    for name in todo:
        workdir = Path(tempfile.mkdtemp(prefix=f'ref_variant_{name}_'))
        main_ini = build_variant(name, workdir)
        print(f'--- {name}: {main_ini}', flush=True)
        vega = VegaInterface(str(main_ini))
        entries = []
        for point in VARIANTS[name]['points']:
            entries.append({
                'params': point,
                'chi2': float(vega.chi2(point)),
                'log_lik': float(vega.log_lik(point)),
            })
            print(f'    {point} -> chi2 {entries[-1]["chi2"]!r}',
                  flush=True)
        goldens[name] = entries
        del vega
        # incremental write: a crash in a later variant keeps progress
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(goldens, indent=1))

    print(f'wrote {out}')


if __name__ == '__main__':
    argv = sys.argv[1:]
    only_arg = None
    if argv and argv[0] == '--only':
        only_arg = argv[1]
        argv = argv[2:]
    main(argv[0] if argv else None, only=only_arg)
