from vega_tpu.parallel.batch import (  # noqa: F401
    BatchedLikelihood, MonteCarloEngine, make_device_mesh)
