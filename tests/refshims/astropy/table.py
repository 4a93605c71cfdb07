"""astropy.table stub: only needed at import time (see README.md)."""


class Table:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            'astropy.table.Table shim: not needed for golden generation')

    @classmethod
    def read(cls, *args, **kwargs):
        raise NotImplementedError(
            'astropy.table.Table shim: not needed for golden generation')
