#!/usr/bin/env python
"""Separate host dispatch cost from device compute in the batched chi^2.

The production `BatchedLikelihood.chi2` re-pads the numpy batch, rebuilds
the statics/collapsed device trees and re-enters `jax.jit` dispatch every
call. This script times, at the same batch size:

  A. bl.chi2(numpy batch)          -> the full production call
  B. fn(device args), same args    -> jit dispatch + device compute
  C. fn(device args) x5 no sync    -> async-queue per-call floor
  D. device compute alone          -> from (B) minus dispatch estimate

Usage: python benchmarks/dispatch_overhead.py [batch]
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


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

    from vega_tpu.vega_interface import VegaInterface
    from vega_tpu.parallel import BatchedLikelihood
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
    batches = {k: v + 0.005 * np.abs(v) * rng.normal(size=batch)
               for k, v in sampled.items()}

    bl = BatchedLikelihood(vega)

    # A. full production call
    t0 = time.time()
    bl.chi2(batches)
    print(f'warmup/compile: {time.time() - t0:.1f}s')
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        out = bl.chi2(batches)
    a = (time.time() - t0) / reps
    print(f'A full bl.chi2 call        {a * 1e3:9.2f} ms/batch '
          f'({batch / a:9.0f} evals/s)')

    # B. jit dispatch + device compute with pre-staged device args
    names = tuple(sorted(batches.keys()))
    per_dev = min(bl.chunk_per_device, -(-batch // bl.n_devices))
    chunk_total = per_dev * bl.n_devices
    padded = {k: jnp.asarray(np.asarray(v).reshape(-1, chunk_total))
              for k, v in batches.items()}
    fn = bl._build(names)
    collapsed = vega._device_collapsed(vega.get_collapsed(names))
    statics = STATICS.device_tree()
    with bl.mesh:
        jax.block_until_ready(fn(padded, statics, collapsed))
        t0 = time.time()
        for _ in range(reps):
            out = fn(padded, statics, collapsed)
            jax.block_until_ready(out)
        b = (time.time() - t0) / reps
        print(f'B fn(device args) synced   {b * 1e3:9.2f} ms/batch '
              f'({batch / b:9.0f} evals/s)')

        # C. async: measure per-call enqueue floor
        t0 = time.time()
        outs = [fn(padded, statics, collapsed) for _ in range(reps)]
        enqueue = (time.time() - t0) / reps
        jax.block_until_ready(outs)
        c = (time.time() - t0) / reps
        print(f'C enqueue only             {enqueue * 1e3:9.2f} ms/call; '
              f'pipelined total {c * 1e3:9.2f} ms/batch '
              f'({batch / c:9.0f} evals/s)')

    n_static = len(jax.tree.leaves(statics))
    n_coll = len(jax.tree.leaves(collapsed))
    print(f'arg tree sizes: statics={n_static} arrays, '
          f'collapsed={n_coll} arrays')


if __name__ == '__main__':
    main()
