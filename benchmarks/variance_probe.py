#!/usr/bin/env python
"""Settle the 0.08 ms vs 93 ms discrepancy for the same chi^2 graph.

Runs the one-vmap full graph and the coeff-only graph, each timed two
ways (pipelined 5-rep with one sync, and per-call sync), with both
REPEATED and VARIED inputs, interleaved A/B style. If repeated-input
timings are ~1000x faster than varied-input ones, the axon runtime
memoizes identical executions and every prior "fast" number was bogus.

Usage: python benchmarks/variance_probe.py [batch]
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

    fixed = make_batch()
    varied = [make_batch() for _ in range(5)]

    names = tuple(sorted(sampled.keys()))
    dv = {k: jnp.asarray(v) for k, v in vega._current_data_vecs().items()}
    cs = vega._current_cov_scales()
    collapsed = vega._device_collapsed(vega.get_collapsed(names))
    statics = STATICS.device_tree()

    def single(p, st, co):
        return vega._chi2_graph_bound(p, dv, cs, st, co)[0]

    fn = jax.jit(jax.vmap(single, in_axes=(0, None, None)))

    t0 = time.time()
    jax.block_until_ready(fn(fixed, statics, collapsed))
    print(f'compile {time.time() - t0:.1f}s', flush=True)

    def timed(label, batches_seq, sync_each):
        t0 = time.time()
        outs = []
        for b in batches_seq:
            out = fn(b, statics, collapsed)
            if sync_each:
                jax.block_until_ready(out)
            outs.append(out)
        jax.block_until_ready(outs)
        per = (time.time() - t0) / len(batches_seq)
        print(f'{label:44s} {per * 1e3:9.2f} ms/batch '
              f'({batch / per:9.0f} evals/s)', flush=True)

    for rnd in range(2):
        timed(f'[{rnd}] fixed input, one sync', [fixed] * 5, False)
        timed(f'[{rnd}] fixed input, sync each', [fixed] * 5, True)
        timed(f'[{rnd}] varied input, one sync', varied, False)
        timed(f'[{rnd}] varied input, sync each', varied, True)


if __name__ == '__main__':
    main()
