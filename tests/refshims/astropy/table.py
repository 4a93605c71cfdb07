"""astropy.table stand-in (see README.md).

`Table.read` supports exactly what the reference uses it for: reading
the shipped DESI instrumental-systematics CSV tables with a header row
(reference correlation_func.py:586-590) and column access by name.
"""

import numpy as np


class Table:
    def __init__(self, columns=None):
        self._columns = dict(columns or {})

    def __getitem__(self, name):
        return self._columns[name]

    def __contains__(self, name):
        return name in self._columns

    @property
    def colnames(self):
        return list(self._columns)

    @classmethod
    def read(cls, filename, **kwargs):
        if not str(filename).endswith('.csv'):
            raise NotImplementedError(
                'astropy.table.Table shim: only CSV tables are supported')
        data = np.genfromtxt(str(filename), delimiter=',', names=True)
        return cls({name: np.asarray(data[name])
                    for name in data.dtype.names})
