"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (the reference
has no multi-node testing at all; see SURVEY.md section 4).

Note: this image registers a remote-TPU ('axon') PJRT plugin at interpreter
boot and pins JAX_PLATFORMS=axon; overriding the jax config here (before any
backend is initialized) is the reliable way to keep tests local.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

# The XLA persistent compilation cache (jax_compilation_cache_dir) was
# evaluated for the compile-dominated slow tier and rejected on this
# image: XLA:CPU AOT reload reports a compile-host/run-host machine-
# feature mismatch (+prefer-no-scatter/+prefer-no-gather), warns of
# possible SIGILL, and measured SLOWER than a fresh compile. The
# package enables the cache by default (it IS a win on the axon TPU
# transport), so explicitly opt the CPU test tier out before any
# vega_tpu import; the grid-payload disk cache
# (gridcollapse.payload_cache_dir) covers the expensive node sweeps
# instead.
os.environ['VEGA_TPU_COMP_CACHE'] = '0'
