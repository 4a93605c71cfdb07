#!/usr/bin/env python
"""Calibrate timing primitives on the axon remote backend.

1. A known-cost f32 matmul chain: if block_until_ready returns before
   the device finishes, measured TFLOP/s will exceed hardware peak.
2. The production chi^2 graph timed with a full np.asarray fetch per
   call on varied inputs — the unfakeable number.

Usage: python benchmarks/sync_calibration.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('VEGA_TPU_GRID_PAD', '0.06')
os.environ.setdefault('VEGA_TPU_GRID_NODES', '20')

import jax
import jax.numpy as jnp
import numpy as np


def calibrate():
    n, reps = 4096, 8
    a = jnp.ones((n, n), jnp.float32)

    @jax.jit
    def chain(a):
        x = a
        for _ in range(reps):
            x = x @ a * (1.0 / n)
        return x

    jax.block_until_ready(chain(a))
    t0 = time.time()
    out = chain(a)
    jax.block_until_ready(out)
    dt = time.time() - t0
    flops = 2 * n ** 3 * reps
    print(f'calibration matmul: {dt * 1e3:.1f} ms -> '
          f'{flops / dt / 1e12:.1f} TFLOP/s f32 '
          f'(v5e peak ~49; >60 means sync is broken)', flush=True)

    t0 = time.time()
    val = np.asarray(chain(a))
    dt = time.time() - t0
    print(f'with np.asarray fetch: {dt * 1e3:.1f} ms -> '
          f'{flops / dt / 1e12:.1f} TFLOP/s (sum {val.sum():.3g})',
          flush=True)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    calibrate()

    from vega_tpu.vega_interface import VegaInterface
    from vega_tpu.statics import STATICS

    if os.path.isdir('/root/reference/tests'):
        os.chdir('/root/reference/tests')
        vega = VegaInterface('full_configs/main.ini')
        sampled = {'bias_eta_LYA': -0.2008, 'beta_LYA': 1.67,
                   'ap': 1.0, 'at': 1.0}
    else:
        import tempfile
        from vega_tpu.testing import make_synthetic_dataset
        workdir = tempfile.mkdtemp(prefix='vega_tpu_prof_')
        vega = VegaInterface(make_synthetic_dataset(workdir, cross=True))
        sampled = {'bias_LYA': -0.117, 'beta_LYA': 1.67,
                   'ap': 1.0, 'at': 1.0}

    rng = np.random.default_rng(0)

    def make_batch():
        return {k: jnp.asarray(v + 0.002 * np.abs(v)
                               * rng.normal(size=batch))
                for k, v in sampled.items()}

    names = tuple(sorted(sampled.keys()))
    dv = {k: jnp.asarray(v) for k, v in vega._current_data_vecs().items()}
    cs = vega._current_cov_scales()
    collapsed = vega._device_collapsed(vega.get_collapsed(names))
    statics = STATICS.device_tree()

    def single(p, st, co):
        return vega._chi2_graph_bound(p, dv, cs, st, co)[0]

    fn = jax.jit(jax.vmap(single, in_axes=(0, None, None)))

    t0 = time.time()
    jax.block_until_ready(fn(make_batch(), statics, collapsed))
    print(f'chi2 compile+first {time.time() - t0:.1f}s', flush=True)

    varied = [make_batch() for _ in range(5)]
    sums = []
    t0 = time.time()
    for b in varied:
        sums.append(float(np.asarray(fn(b, statics, collapsed)).sum()))
    per = (time.time() - t0) / len(varied)
    print(f'chi2 varied + full fetch: {per * 1e3:.2f} ms/batch '
          f'({batch / per:.0f} evals/s)', flush=True)
    print('per-batch chi2 sums (should differ):',
          [f'{s:.6g}' for s in sums], flush=True)


if __name__ == '__main__':
    main()
