#!/usr/bin/env python
"""Bisect the production chi^2 graph: which piece costs the 59 ms/batch
that neither the coefficient trace (0.04 ms) nor the grid-payload math
(0.05 ms) accounts for.

Times, at the same batch under one plain vmap jit (no mesh, no lax.map):

  A. full _chi2_graph_bound with the grid payload
  B. same graph, priors stripped
  C. same graph, bad-flag ignored (chi2 without the jnp.where)
  D. coefficients + payload math only (manual reimplementation)

Usage: python benchmarks/graph_bisect.py [batch]
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
    from vega_tpu.gridcollapse import grid_tvecs, grid_corr_chi2

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
    batches = {k: jnp.asarray(v + 0.002 * np.abs(v)
                              * rng.normal(size=batch))
               for k, v in sampled.items()}

    names = tuple(sorted(sampled.keys()))
    dv = {k: jnp.asarray(v) for k, v in vega._current_data_vecs().items()}
    cs = vega._current_cov_scales()
    collapsed = vega._device_collapsed(vega.get_collapsed(names))
    statics = STATICS.device_tree()
    spec = collapsed['__grid__']
    corr_names = [n for n in vega.corr_items if n in collapsed]

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
        print(f'{label:42s} {per * 1e3:9.2f} ms/batch '
              f'({batch / per:9.0f} evals/s)  [compile {compile_s:.1f}s]',
              flush=True)
        return out

    # A. full production graph, one vmap
    def full_one(p, st, co):
        return vega._chi2_graph_bound(p, dv, cs, st, co)[0]

    fa = jax.jit(jax.vmap(full_one, in_axes=(0, None, None)))
    run('A full graph (one vmap)', fa, batches, statics, collapsed)

    # D. manual: coefficient trace + payload math only
    ref_subst = dict(zip(spec.names, spec.ref))

    def manual_one(p, st, co):
        with STATICS.bind(st):
            sref = dict(p)
            sref.update(ref_subst)
            mp = vega._get_lcl_prms(sref)
            model_cf, bad = vega._model_graph(mp, keep_factored=True)
            tvecs, excess = grid_tvecs(spec, p)
            chi2 = 0.
            for n in corr_names:
                fxi = model_cf[n].mask(vega.data[n].model_mask)
                c = fxi.coeff_vector()
                chi2 = chi2 + cs[n] * grid_corr_chi2(co[n], tvecs, c)
            return chi2 + jnp.where(bad, 1e100, 0.)

    fd = jax.jit(jax.vmap(manual_one, in_axes=(0, None, None)))
    run('D manual coeff+payload (+bad)', fd, batches, statics, collapsed)

    # D2. manual without the bad flag
    def manual_nobad(p, st, co):
        with STATICS.bind(st):
            sref = dict(p)
            sref.update(ref_subst)
            mp = vega._get_lcl_prms(sref)
            model_cf, _ = vega._model_graph(mp, keep_factored=True)
            tvecs, excess = grid_tvecs(spec, p)
            chi2 = 0.
            for n in corr_names:
                fxi = model_cf[n].mask(vega.data[n].model_mask)
                c = fxi.coeff_vector()
                chi2 = chi2 + cs[n] * grid_corr_chi2(co[n], tvecs, c)
            return chi2

    fd2 = jax.jit(jax.vmap(manual_nobad, in_axes=(0, None, None)))
    run('D2 manual coeff+payload (no bad)', fd2, batches, statics,
        collapsed)

    # D3. manual + priors + local trace (the remaining production glue)
    def manual_glue(p, st, co):
        with STATICS.bind(st):
            lp = vega._get_lcl_prms(p)
            sref = dict(p)
            sref.update(ref_subst)
            mp = vega._get_lcl_prms(sref)
            model_cf, bad = vega._model_graph(mp, keep_factored=True)
            tvecs, excess = grid_tvecs(spec, p)
            chi2 = 0.
            for n in corr_names:
                fxi = model_cf[n].mask(vega.data[n].model_mask)
                c = fxi.coeff_vector()
                chi2 = chi2 + cs[n] * grid_corr_chi2(co[n], tvecs, c)
            chi2 = chi2 + vega._prior_chi2_graph(lp)
            chi2 = chi2 + 1e8 * excess
            return jnp.where(bad, 1e100, chi2)

    fd3 = jax.jit(jax.vmap(manual_glue, in_axes=(0, None, None)))
    run('D3 manual + priors + wall + where', fd3, batches, statics,
        collapsed)

    for label, fn in [('A', fa), ('D', fd)]:
        try:
            comp = fn.lower(batches, statics, collapsed).compile()
            ca = comp.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            print(f'{label} cost: flops={ca.get("flops", 0):.3g} '
                  f'bytes={ca.get("bytes accessed", 0):.3g}')
        except Exception as e:                              # pragma: no cover
            print(f'{label} cost analysis failed: {e}')


if __name__ == '__main__':
    main()
