"""getdist import stub (postprocess only; not used in golden runs)."""


class MCSamples:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError('getdist shim')


def loadMCSamples(*args, **kwargs):
    raise NotImplementedError('getdist shim')
