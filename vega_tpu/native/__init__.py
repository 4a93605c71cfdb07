from vega_tpu.native.pair_hist import (  # noqa: F401
    pair_histograms, pair_ratio_range, native_available)
