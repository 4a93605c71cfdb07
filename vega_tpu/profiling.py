"""jit-aware timing and profiling hooks.

The reference's only instrumentation is a wall-clock print around
minimization (reference: minimizer.py:48,101). Here:

- `timed(label)` context manager — wall time with device sync.
- `time_likelihood(vega, n)` — compile time + steady-state eval rate of
  the jitted chi^2.
- `trace(dir)` — jax.profiler trace context (TensorBoard format), when
  the backend supports it.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax


@contextmanager
def timed(label, sync=True):
    start = time.perf_counter()
    yield
    if sync:
        try:
            jax.block_until_ready(jax.numpy.zeros(()))
        except Exception:
            pass
    print(f'TIMING {label}: {time.perf_counter() - start:.4f}s')


def time_likelihood(vega, n_evals=50, params=None):
    """Compile time and steady-state throughput of the jitted chi^2."""
    params = params or {}
    start = time.perf_counter()
    chi2 = vega.chi2(params)
    compile_time = time.perf_counter() - start

    start = time.perf_counter()
    for _ in range(n_evals):
        chi2 = vega.chi2(params)
    elapsed = time.perf_counter() - start
    rate = n_evals / elapsed
    print(f'TIMING chi2: first call {compile_time:.2f}s '
          f'(incl. compile), steady {1e3 / rate:.2f} ms/eval '
          f'({rate:.1f} evals/s), chi2 = {chi2:.6f}')
    return {'compile_time': compile_time, 'evals_per_sec': rate,
            'chi2': chi2}


@contextmanager
def trace(log_dir='/tmp/vega_tpu_trace'):
    """jax.profiler trace (viewable in TensorBoard / Perfetto)."""
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as exc:
        print(f'WARNING: profiler trace unavailable: {exc}')
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()
            print(f'Profiler trace written to {log_dir}')
