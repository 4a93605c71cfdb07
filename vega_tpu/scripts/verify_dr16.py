"""Verify a downloaded eBOSS DR16 Lya-forest data directory against the
shipped manifest, so a real-data Table-6 run starts from known-good
inputs (reference: examples/eBOSS_DR16/README.rst points users at the
SDSS SVN without any integrity checking).

Two layers of checking:

1. **Structure** — every file the DR16 analysis needs is present under
   the expected SVN name, opens as FITS, and carries the HDUs/columns
   the Data reader will ask for (reference data.py:285-420 for the
   correlation layout, :556-687 for the metal layout): DA/CO/DM (or
   their *_BLIND variants) + RP/RT/Z/NB and the RPMIN/RPMAX/RTMAX/NP/NT
   header for correlations; RP_/RT_/Z_ + DM_ columns for every metal
   pair the DR16 configs request (same pair semantics as
   Data._metal_pairs, including the CIV(eff)-only-with-itself and
   SiII-auto exclusions, reference data.py:632-653).

2. **Checksums** — the shipped manifest cannot pin SHA256 values (this
   package is built without network access to the SDSS SVN), so the
   first `--record` run writes `dr16_manifest.local.json` into the data
   directory with the hashes of YOUR verified download
   (trust-on-first-use); every later run validates against the pinned
   values, catching silent corruption or partial re-downloads.

Usage:
    python -m vega_tpu.scripts.verify_dr16 --data-dir /path/to/lya_forest [--record]

Exit status 0 = verified; 1 = any failure (each printed with the file
and the missing piece).
"""

import argparse
import hashlib
import json
import sys
from pathlib import Path


LOCAL_MANIFEST = 'dr16_manifest.local.json'


def load_manifest():
    path = Path(__file__).resolve().parents[1] / 'models' / 'dr16_manifest.json'
    with open(path) as fh:
        return json.load(fh)


def required_metal_pairs(tracer1, tracer2, metals, use_metal_autos=True):
    """Metal pair names whose RP_/RT_/Z_/DM_ columns the DR16 configs
    will request from a metal file (same list and filters as
    Data._metal_pairs + Data._use_correlation; reference
    data.py:556-653). For the QSO cross only `in tracer2` carries
    metals (reference examples/eBOSS_DR16/qsoxlyalya.ini).

    use_metal_autos mirrors the [model] key of the same name, default
    True — the DR16 configs do not set it, so SiII-SiII pairs ARE read
    by the run and must be verified (reference data.py:45,650)."""
    is_auto = tracer1 == tracer2
    in1 = list(metals) if is_auto else None
    in2 = list(metals)

    def use(m1, m2):
        if m1 == 'CIV(eff)' or m2 == 'CIV(eff)':
            return m1 == m2
        if 'SiII' in m1 and 'SiII' in m2 and not use_metal_autos:
            return False
        return True

    pairs = []
    for metal in in2:
        pairs.append((tracer1, metal))
    for metal in in1 or []:
        pairs.append((metal, tracer2))
    if in1:
        for i, m1 in enumerate(in1):
            for m2 in in2[i if is_auto else 0:]:
                pairs.append((m1, m2))
    return [p for p in pairs if use(*p)]


def check_correlation(hdul, info, errors, fname):
    cols = hdul[1].columns
    header = hdul[1].header
    if 'DA' not in cols and 'DA_BLIND' not in cols:
        errors.append(f'{fname}: no DA or DA_BLIND column in HDU 1')
    if 'CO' not in cols:
        errors.append(f'{fname}: no CO (covariance) column in HDU 1')
    if 'DM' not in cols and 'DM_BLIND' not in cols:
        errors.append(f'{fname}: no DM or DM_BLIND (distortion) column '
                      'in HDU 1')
    for col in ('RP', 'RT', 'Z', 'NB'):
        if col not in cols:
            errors.append(f'{fname}: no {col} column in HDU 1')
    for key in ('RPMIN', 'RPMAX', 'RTMAX', 'NP', 'NT'):
        if key not in header:
            errors.append(f'{fname}: header key {key} missing from HDU 1')
    if info.get('is_cross') and 'RPMIN' in header and header['RPMIN'] >= 0:
        errors.append(f'{fname}: cross-correlation file has RPMIN = '
                      f'{header["RPMIN"]} (expected negative)')


def check_metal(hdul, info, metals, errors, fname):
    header = hdul[1].header
    for key in ('RPMIN', 'RPMAX', 'RTMAX', 'NP', 'NT'):
        if key not in header:
            errors.append(f'{fname}: header key {key} missing from HDU 1')
    if len(hdul) < 3:
        errors.append(f'{fname}: expected the metal-matrix table in '
                      'HDU 2 (file has fewer HDUs)')
        return
    # Match the reader exactly (data.py:378-420): RP_/RT_/Z_ columns are
    # read from HDU 2 ONLY; the DM_ column may fall back to HDU 3. A
    # column the verifier accepts from the wrong HDU would pass
    # verification but crash the actual run.
    cols = set(hdul[2].columns)
    dm_cols = set(cols)
    if len(hdul) > 3:
        dm_cols |= set(hdul[3].columns)
    blinded = header.get('BLINDING', 'none') != 'none'
    dm_prefix = 'DM_BLIND_' if blinded else 'DM_'
    tracer1, tracer2 = info['tracers']
    for pair in required_metal_pairs(tracer1, tracer2, metals):
        # column names may carry the pair in either order
        # (reference data.py:384-387)
        name = '_'.join(pair)
        alt = '_'.join(reversed(pair))
        if f'RP_{name}' not in cols and f'RP_{alt}' not in cols:
            errors.append(f'{fname}: no RP_{name} (or RP_{alt}) column '
                          'in HDU 2 for a metal pair the DR16 configs '
                          'request')
            continue
        if f'RP_{name}' not in cols:
            name = alt
        for prefix in ('RT_', 'Z_'):
            if f'{prefix}{name}' not in cols:
                errors.append(f'{fname}: no {prefix}{name} column in '
                              'HDU 2')
        if f'{dm_prefix}{name}' not in dm_cols:
            errors.append(f'{fname}: no {dm_prefix}{name} column in '
                          'HDU 2 or 3')


def sha256_of(path, chunk=1 << 22):
    h = hashlib.sha256()
    with open(path, 'rb') as fh:
        while True:
            block = fh.read(chunk)
            if not block:
                break
            h.update(block)
    return h.hexdigest()


def verify(data_dir, record=False, out=sys.stdout):
    """Returns (ok, report dict). Prints per-file status to `out`."""
    from vega_tpu.io.fits import read_fits

    manifest = load_manifest()
    metals = manifest['metals']
    data_dir = Path(data_dir)
    local_path = data_dir / LOCAL_MANIFEST
    pinned = {}
    if local_path.exists():
        with open(local_path) as fh:
            pinned = json.load(fh).get('sha256', {})

    errors = []
    hashes = {}
    for fname, info in manifest['files'].items():
        path = data_dir / fname
        if not path.exists():
            errors.append(
                f'{fname}: MISSING from {data_dir} (expected from '
                f'{manifest["source"]})')
            continue
        try:
            hdul = read_fits(path)
        except Exception as exc:  # corrupt / not FITS
            errors.append(f'{fname}: unreadable as FITS ({exc})')
            continue
        if info['kind'] == 'correlation':
            check_correlation(hdul, info, errors, fname)
        else:
            check_metal(hdul, info, metals, errors, fname)

        digest = sha256_of(path)
        hashes[fname] = digest
        expected = info.get('sha256') or pinned.get(fname)
        if expected and digest != expected:
            errors.append(
                f'{fname}: SHA256 mismatch — file is {digest[:16]}..., '
                f'pinned manifest says {expected[:16]}... (corrupt or '
                'partially re-downloaded; delete and re-fetch)')
        elif expected:
            print(f'  ok  {fname}  (sha256 pinned)', file=out)
        else:
            print(f'  ok  {fname}  (structure only; sha256 {digest[:16]}...'
                  ' unpinned)', file=out)

    for err in errors:
        print(f'FAIL  {err}', file=out)

    ok = not errors
    if ok and record:
        with open(local_path, 'w') as fh:
            json.dump({'source': manifest['source'],
                       'sha256': hashes}, fh, indent=2)
        print(f'recorded {len(hashes)} checksums -> {local_path}', file=out)
    return ok, {'errors': errors, 'sha256': hashes}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--data-dir', required=True,
                        help='directory holding the SDSS DR16 lya_forest '
                             'download')
    parser.add_argument('--record', action='store_true',
                        help='pin the verified checksums into '
                             f'{LOCAL_MANIFEST} (trust-on-first-use)')
    args = parser.parse_args(argv)
    ok, _ = verify(args.data_dir, record=args.record)
    if ok:
        print('DR16 data directory verified.')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
