#!/usr/bin/env python
"""Vendor the published model data assets into vega_tpu/models/.

The reference distribution ships published cosmology data products
(reference: vega/models/ — fiducial linear power spectra with their BAO
side-band decompositions for PlanckDR16/Planck18/PlanckDR12/DR9LyaMocks,
the Fvoigt HCD absorption profiles, and the DESI instrumental-systematics
tables). These are scientific data tables (CAMB outputs, published survey
products), not code. This script re-emits them through vega_tpu's own
FITS/text IO into `vega_tpu/models/`, so the framework runs with no
reference checkout mounted (`utils.find_file` then resolves everything
package-locally; set VEGA_TPU_NO_REFERENCE=1 to forbid the fallback).

Fully self-contained alternatives for the fiducial spectra also exist:
`vega_tpu/models/eisenstein_hu.py` (analytic EH98 wiggle/no-wiggle) and
`vega_tpu/scripts/make_template.py` (CAMB, when installed). The vendored
tables are preferred for parity with published analyses.

Run:  python -m vega_tpu.scripts.vendor_model_data [--source DIR] [--dest DIR]
"""

import argparse
import os
import shutil
from pathlib import Path

import numpy as np

FITS_FAMILIES = ['PlanckDR16', 'Planck18', 'PlanckDR12', 'DR9LyaMocks']


def vendor_fits(src_dir: Path, dest_dir: Path) -> int:
    """Re-emit every fiducial-Pk FITS through our reader/writer, byte
    content verified by reading both back."""
    from vega_tpu.io.fits import read_fits, write_fits

    count = 0
    for family in FITS_FAMILIES:
        src_fam = src_dir / family
        if not src_fam.is_dir():
            continue
        dest_fam = dest_dir / family
        dest_fam.mkdir(parents=True, exist_ok=True)
        for path in sorted(src_fam.iterdir()):
            if path.suffix == '.fits':
                hdus = read_fits(path)
                specs = []
                for hdu in hdus[1:]:
                    header = {
                        k: v for k, v in hdu.header.items()
                        if k not in ('XTENSION', 'BITPIX', 'NAXIS', 'NAXIS1',
                                     'NAXIS2', 'PCOUNT', 'GCOUNT', 'TFIELDS',
                                     'EXTNAME')
                        and not k.startswith(('TTYPE', 'TFORM', 'TUNIT',
                                              'TDIM'))
                    }
                    specs.append({'name': hdu.name, 'header': header,
                                  'columns': dict(hdu.columns)})
                out = dest_fam / path.name
                write_fits(out, specs)
                _verify_fits(path, out)
                count += 1
            elif path.suffix in ('.ini', '.dat', '.txt'):
                # provenance metadata (CAMB parameter files etc.)
                shutil.copyfile(path, dest_fam / path.name)
                count += 1
    return count


def _verify_fits(src, dest):
    from vega_tpu.io.fits import read_fits
    a, b = read_fits(src), read_fits(dest)
    for hdu_a, hdu_b in zip(a[1:], b[1:]):
        assert hdu_a.name == hdu_b.name, (src, hdu_a.name, hdu_b.name)
        for col in hdu_a.columns:
            np.testing.assert_array_equal(
                hdu_a.columns[col], hdu_b.columns[col],
                err_msg=f'{src}:{hdu_a.name}:{col}')


def vendor_text_tables(src_dir: Path, dest_dir: Path) -> int:
    """Fvoigt profiles and DESI instrumental-systematics tables."""
    count = 0
    fv_src = src_dir / 'fvoigt_models'
    if fv_src.is_dir():
        fv_dest = dest_dir / 'fvoigt_models'
        fv_dest.mkdir(parents=True, exist_ok=True)
        for path in sorted(fv_src.glob('*.txt')):
            table = np.loadtxt(path)
            np.savetxt(fv_dest / path.name, table, fmt='%.18e')
            np.testing.assert_allclose(np.loadtxt(fv_dest / path.name),
                                       table, rtol=0, atol=0)
            count += 1

    syst_src = src_dir / 'instrumental_systematics'
    if syst_src.is_dir():
        syst_dest = dest_dir / 'instrumental_systematics'
        syst_dest.mkdir(parents=True, exist_ok=True)
        for path in sorted(syst_src.glob('*.csv')):
            shutil.copyfile(path, syst_dest / path.name)
            count += 1
    return count


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--source', default='/root/reference/vega/models')
    parser.add_argument(
        '--dest',
        default=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'models'))
    args = parser.parse_args(argv)

    src, dest = Path(args.source), Path(args.dest)
    if not src.is_dir():
        raise SystemExit(f'source model directory not found: {src}')
    n_fits = vendor_fits(src, dest)
    n_txt = vendor_text_tables(src, dest)
    print(f'vendored {n_fits} FITS/metadata files and {n_txt} text tables '
          f'into {dest}')


if __name__ == '__main__':
    main()
