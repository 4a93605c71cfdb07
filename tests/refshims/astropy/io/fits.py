"""Read-only astropy.io.fits facade over the pure-numpy reader in
vega_tpu.io.fits (I/O only — no numerics; see README.md)."""

import sys
from pathlib import Path

# vega_tpu provides the FITS parser; make it importable from the repo
# root without requiring installation
_repo = str(Path(__file__).resolve().parents[4])
if _repo not in sys.path:
    sys.path.insert(0, _repo)

from vega_tpu.io.fits import read_fits  # noqa: E402


class _Columns:
    def __init__(self, names):
        self.names = list(names)

    def __contains__(self, name):
        return name in self.names

    def __iter__(self):
        return iter(self.names)


class _Data:
    """Record-array-ish view: data['COL'] returns the column."""

    def __init__(self, columns):
        self._columns = columns

    def __getitem__(self, key):
        return self._columns[key]

    def __contains__(self, key):
        return key in self._columns


class _HDU:
    def __init__(self, raw):
        self._raw = raw
        self.header = raw.header
        cols = getattr(raw, 'columns', None)
        if cols is not None:
            self.columns = _Columns(cols.keys())
            self.data = _Data(cols)
        else:
            self.columns = _Columns([])
            self.data = getattr(raw, 'data', None)


class HDUList(list):
    def close(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def open(path, *args, **kwargs):   # noqa: A001 - astropy's name
    return HDUList(_HDU(h) for h in read_fits(path))
