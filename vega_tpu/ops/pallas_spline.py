"""Pallas TPU kernel: fused multipole spline evaluation + Legendre
combination.

The per-evaluation tail of the Pk->Xi transform evaluates, for each of
the ~2500-5000 output bins, four cubic splines (one per even multipole)
at the AP-rescaled log r and contracts them with P_l(mu). XLA emits this
as 8 independent gathers plus elementwise chains; this kernel performs
it in one VMEM-resident pass:

- the knot tables (4 multipoles x ~814 knots of values + second
  derivatives, ~52 KB in f32) stay in VMEM across the whole grid;
- query points are tiled; interval indices come from arithmetic (the
  knots are uniform in log r), so there is no binary search;
- the Hermite evaluation and the sum over multipoles fuse into the same
  pass.

f32 only (TPU Pallas has no f64) — used by the throughput mode; the f64
parity path keeps the XLA implementation in ops/spline.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024


def _kernel(x0_step_ref, y_ref, m_ref, xq_ref, leg_ref, out_ref):
    """One query tile.

    x0_step_ref: (1, 4) SMEM — [x0, step, n_knots, h]
    y_ref, m_ref: (L, N) VMEM — spline values / second derivatives
    xq_ref: (1, TILE) VMEM — query points (clamped by caller)
    leg_ref: (L, TILE) VMEM — Legendre P_l(mu) weights per query
    out_ref: (1, TILE) VMEM — combined output
    """
    x0 = x0_step_ref[0, 0]
    step = x0_step_ref[0, 1]
    n = x0_step_ref[0, 2].astype(jnp.int32)

    xq = xq_ref[0, :]
    j = jnp.clip(((xq - x0) / step).astype(jnp.int32), 0, n - 2)
    x_lo = x0 + j.astype(xq.dtype) * step
    t_lo = (xq - x_lo) / step
    t_hi = 1.0 - t_lo
    h2 = step * step / 6.0
    w_lo = t_hi * t_hi * t_hi - t_hi
    w_hi = t_lo * t_lo * t_lo - t_lo

    n_ell = y_ref.shape[0]
    acc = jnp.zeros_like(xq)
    for ell_idx in range(n_ell):
        y_row = y_ref[ell_idx, :]
        m_row = m_ref[ell_idx, :]
        y_lo = jnp.take(y_row, j, axis=0)
        y_hi = jnp.take(y_row, j + 1, axis=0)
        m_lo = jnp.take(m_row, j, axis=0)
        m_hi = jnp.take(m_row, j + 1, axis=0)
        val = (y_lo * t_hi + y_hi * t_lo
               + h2 * (m_lo * w_lo + m_hi * w_hi))
        acc = acc + val * leg_ref[ell_idx, :]
    out_ref[0, :] = acc


def spline_legendre_combine(logr_knots, xi_knots, m_knots, log_r,
                            legendre_mu, interpret=False):
    """Fused evaluate-and-combine:
        out[q] = sum_l spline_l(log_r[q]) * legendre_mu[l, q]

    logr_knots must be a (host) uniform grid. Traced inputs are cast to
    f32; out-of-range queries are clamped (callers track the oob flag
    separately). Call inside jit — the pallas_call is the kernel.
    """
    knots = np.asarray(logr_knots)
    n = knots.shape[0]
    x0 = float(knots[0])
    step = float((knots[-1] - knots[0]) / (n - 1))

    xq = jnp.clip(jnp.asarray(log_r, jnp.float32),
                  np.float32(knots[0]), np.float32(knots[-1]))
    y = jnp.asarray(xi_knots, jnp.float32)
    m = jnp.asarray(m_knots, jnp.float32)
    leg = jnp.asarray(legendre_mu, jnp.float32)

    n_q = xq.shape[0]
    pad = (-n_q) % TILE
    xq_p = jnp.pad(xq, (0, pad))[None, :]
    leg_p = jnp.pad(leg, ((0, 0), (0, pad)))
    num_tiles = (n_q + pad) // TILE

    scalars = jnp.array([[x0, step, float(n), step]], dtype=jnp.float32)

    out = pl.pallas_call(
        _kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((y.shape[0], y.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m.shape[0], m.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((leg.shape[0], TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_q + pad), jnp.float32),
        interpret=interpret,
    )(scalars, y, m, xq_p, leg_p)
    return out[0, :n_q]


def _batched_kernel(x0_step_ref, y_ref, m_ref, xq_ref, leg_ref, out_ref):
    """Batched variant: blocks carry a leading singleton batch index."""
    x0 = x0_step_ref[0, 0]
    step = x0_step_ref[0, 1]
    n = x0_step_ref[0, 2].astype(jnp.int32)

    xq = xq_ref[0, 0, :]
    j = jnp.clip(((xq - x0) / step).astype(jnp.int32), 0, n - 2)
    x_lo = x0 + j.astype(xq.dtype) * step
    t_lo = (xq - x_lo) / step
    t_hi = 1.0 - t_lo
    h2 = step * step / 6.0
    w_lo = t_hi * t_hi * t_hi - t_hi
    w_hi = t_lo * t_lo * t_lo - t_lo

    acc = jnp.zeros_like(xq)
    for ell_idx in range(y_ref.shape[1]):
        y_row = y_ref[0, ell_idx, :]
        m_row = m_ref[0, ell_idx, :]
        val = (jnp.take(y_row, j, axis=0) * t_hi
               + jnp.take(y_row, j + 1, axis=0) * t_lo
               + h2 * (jnp.take(m_row, j, axis=0) * w_lo
                       + jnp.take(m_row, j + 1, axis=0) * w_hi))
        acc = acc + val * leg_ref[0, ell_idx, :]
    out_ref[0, 0, :] = acc


def spline_legendre_combine_batched(logr_knots, xi_knots, m_knots, log_r,
                                    legendre_mu, interpret=False):
    """Batched fused kernel: xi_knots/m_knots (B, L, N), log_r (B, M),
    legendre_mu (B, L, M) -> (B, M). Grid = (batch, query tiles)."""
    knots = np.asarray(logr_knots)
    n = knots.shape[0]
    x0 = float(knots[0])
    step = float((knots[-1] - knots[0]) / (n - 1))

    xq = jnp.clip(jnp.asarray(log_r, jnp.float32),
                  np.float32(knots[0]), np.float32(knots[-1]))
    y = jnp.asarray(xi_knots, jnp.float32)
    m = jnp.asarray(m_knots, jnp.float32)
    leg = jnp.asarray(legendre_mu, jnp.float32)

    n_b, n_ell, n_k = y.shape
    n_q = xq.shape[1]
    pad = (-n_q) % TILE
    xq_p = jnp.pad(xq, ((0, 0), (0, pad)))[:, None, :]
    leg_p = jnp.pad(leg, ((0, 0), (0, 0), (0, pad)))
    num_tiles = (n_q + pad) // TILE

    scalars = jnp.array([[x0, step, float(n), step]], dtype=jnp.float32)

    out = pl.pallas_call(
        _batched_kernel,
        grid=(n_b, num_tiles),
        in_specs=[
            pl.BlockSpec((1, 4), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_ell, n_k), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_ell, n_k), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_ell, TILE), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TILE), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_b, 1, n_q + pad), jnp.float32),
        interpret=interpret,
    )(scalars, y, m, xq_p, leg_p)
    return out[:, 0, :n_q]


def make_vmappable_combine(logr_knots, interpret=False):
    """custom_vmap wrapper so the fused kernel survives the batched
    likelihood's vmap (the generic pallas vmap rule cannot tile these
    block shapes). No autodiff rule: the pallas path is for
    non-differentiated throughput work (samplers, scans, benchmarking)."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def combine(xi_knots, m_knots, log_r, legendre_mu):
        return spline_legendre_combine(logr_knots, xi_knots, m_knots,
                                       log_r, legendre_mu,
                                       interpret=interpret)

    @combine.def_vmap
    def _vmap_rule(axis_size, in_batched, xi_knots, m_knots, log_r,
                   legendre_mu):
        def bcast(x, batched):
            if batched:
                return x
            return jnp.broadcast_to(x, (axis_size,) + x.shape)

        out = spline_legendre_combine_batched(
            logr_knots,
            bcast(xi_knots, in_batched[0]),
            bcast(m_knots, in_batched[1]),
            bcast(log_r, in_batched[2]),
            bcast(legendre_mu, in_batched[3]),
            interpret=interpret)
        return out, True

    return combine
