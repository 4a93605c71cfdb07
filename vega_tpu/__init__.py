"""vega_tpu — TPU-native likelihood engine for Lyman-alpha forest
correlation-function analyses (BAO and full-shape fits).

A from-scratch JAX/XLA re-imagination of the capabilities of
andreicuceu/vega: the whole model + chi^2 pipeline compiles to a single
jitted function of the parameter vector, with vmap/shard_map batching of
likelihood evaluations across TPU chips replacing the reference's MPI
fan-out.
"""

__version__ = '0.1.0'

# f64 everywhere: the correctness oracle is chi^2 agreement with the
# reference at ~1e-8 relative. TPU runs can opt into mixed precision via
# the precision knob on the likelihood builder.
import os as _os

import jax as _jax

# VEGA_TPU_X64=0 opts into the f32 throughput mode (benchmarking /
# sampling-grade accuracy); default is full f64 parity mode.
if _os.environ.get('VEGA_TPU_X64', '1') != '0':
    _jax.config.update('jax_enable_x64', True)

# Persistent compilation cache, ON by default: probed on this image's
# remote-TPU ('axon') PJRT plugin — executable deserialization works
# (a second process reloads a cached executable in ~0.1 s instead of
# recompiling), so the O(100-250 s) per-process cold compiles of the
# likelihood graphs are paid once per machine, not once per process.
# VEGA_TPU_COMP_CACHE=0 disables; any other value overrides the
# directory (default ~/.cache/vega_tpu_xla). jax falls back to plain
# compilation on any cache error, so this is never fatal.
_cache_env = _os.environ.get('VEGA_TPU_COMP_CACHE', '')
if _cache_env != '0':
    _cache_dir = _cache_env or _os.path.join(
        _os.path.expanduser('~'), '.cache', 'vega_tpu_xla')
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update('jax_compilation_cache_dir', _cache_dir)
        _jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    except Exception:  # cache is an optimization, never fatal
        pass

_EXPORTS = {
    'VegaInterface': 'vega_tpu.vega_interface',
    'BuildConfig': 'vega_tpu.build_config',
    'FitResults': 'vega_tpu.postprocess.fit_results',
    'VegaPlots': 'vega_tpu.plots.plot',
    'Wedge': 'vega_tpu.plots.wedges',
    'Shell': 'vega_tpu.plots.shell',
    'RtWedge': 'vega_tpu.plots.rt_wedges',
    'run_vega': 'vega_tpu.scripts.run_vega',
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    # Lazy exports keep import-time light and avoid circular imports
    if name in _EXPORTS:
        import importlib
        module = importlib.import_module(_EXPORTS[name])
        return getattr(module, name)
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
