"""numba shim: @njit as a pass-through (see README.md)."""


class _DType:
    """Stands in for numba type objects: float64, float64[:, :],
    float64(float64, ...) all resolve to inert markers."""

    def __call__(self, *args, **kwargs):
        return self

    def __getitem__(self, item):
        return self


float64 = _DType()
float32 = _DType()
int64 = _DType()
int32 = _DType()


def njit(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not isinstance(args[0],
                                                               _DType):
        return args[0]

    def decorator(fn):
        return fn
    return decorator


jit = njit


def prange(*args):
    return range(*args)
