#!/usr/bin/env python
"""Bisect the production BatchedLikelihood wrapper: the full chi^2 graph
under one plain vmap jit runs at ~0.08 ms/batch, but the production
jit (mesh shardings + lax.map chunks of 128) costs ~60-80 ms/batch.

  A. one vmap, plain jit                       (baseline, fast)
  E. lax.map over (16, 128) chunks, plain jit  (chunking alone)
  F. E + in/out shardings on the 1-device mesh (exact production build)
  G. bl._build(names) called directly          (the real production fn)

Usage: python benchmarks/wrapper_bisect.py [batch]
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
from jax.sharding import NamedSharding, PartitionSpec as P


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
    flat = {k: jnp.asarray(v + 0.002 * np.abs(v) * rng.normal(size=batch))
            for k, v in sampled.items()}

    names = tuple(sorted(sampled.keys()))
    dv = {k: jnp.asarray(v) for k, v in vega._current_data_vecs().items()}
    cs = vega._current_cov_scales()
    collapsed = vega._device_collapsed(vega.get_collapsed(names))
    statics = STATICS.device_tree()

    bl = BatchedLikelihood(vega)
    per_dev = min(bl.chunk_per_device, -(-batch // bl.n_devices))
    chunk_total = per_dev * bl.n_devices
    chunked_args = {k: jnp.asarray(np.asarray(v).reshape(-1, chunk_total))
                    for k, v in flat.items()}

    def run(label, fn, *args):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        compile_s = time.time() - t0
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        per = (time.time() - t0) / reps
        print(f'{label:44s} {per * 1e3:9.2f} ms/batch '
              f'({batch / per:9.0f} evals/s)  [compile {compile_s:.1f}s]',
              flush=True)

    def single(p, st, co):
        return vega._chi2_graph_bound(p, dv, cs, st, co)[0]

    # A. one vmap, plain jit
    fa = jax.jit(jax.vmap(single, in_axes=(0, None, None)))
    run('A one vmap, plain jit', fa, flat, statics, collapsed)

    # E. lax.map chunks, plain jit
    def chunked(pc, st, co):
        def one_chunk(ch):
            return jax.vmap(single, in_axes=(0, None, None))(ch, st, co)
        return jax.lax.map(one_chunk, pc).reshape(-1)

    fe = jax.jit(chunked)
    run('E lax.map chunks, plain jit', fe, chunked_args, statics,
        collapsed)

    # F. E + production shardings on the mesh
    chunk_sh = NamedSharding(bl.mesh, P(None, bl.axis_name))
    flat_sh = NamedSharding(bl.mesh, P(bl.axis_name))
    repl = NamedSharding(bl.mesh, P())
    ff = jax.jit(chunked, in_shardings=(chunk_sh, repl, repl),
                 out_shardings=flat_sh)
    with bl.mesh:
        run('F chunks + shardings + mesh', ff, chunked_args, statics,
            collapsed)

    # G. the real production fn
    fg = bl._build(names)
    with bl.mesh:
        run('G bl._build (production)', fg, chunked_args, statics,
            collapsed)


if __name__ == '__main__':
    main()
