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

TPU gather constraint: Mosaic's `tpu.dynamic_gather` gathers only
within ONE (8, 128) vreg — a flat 1024-lane gather fails with "Multiple
source vregs along gather dimension". So each knot table is laid out as
one (8, 128) vreg per multipole; a flat interval index j splits into
(sublane, lane) = (j >> 7, j & 127); the lane part drives 8 single-vreg
lane gathers (one per table sublane, broadcast across the query vreg)
and the sublane part selects among them. Queries tile as (8, 128)
vregs, so every take_along_axis below is exactly one dynamic_gather.

f32 only (TPU Pallas has no f64) — used by the throughput mode; the f64
parity path keeps the XLA implementation in ops/spline.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
TILE = SUB * LANE  # 1024 queries per grid step; also the padded table size


def _gather_vreg(tbl, sub, lane):
    """Gather tbl.reshape(SUB*LANE)[sub*LANE + lane] for a (SUB, LANE)
    vreg of indices. tbl: (SUB, LANE); sub, lane: (SUB, LANE) int32."""
    out = jnp.zeros(lane.shape, tbl.dtype)
    for t in range(SUB):
        row = jnp.broadcast_to(tbl[t, :][None, :], lane.shape)
        cand = jnp.take_along_axis(row, lane, axis=1)
        out = jnp.where(sub == t, cand, out)
    return out


def _hermite(y_tbl, m_tbl, j, t_lo, t_hi, w_lo, w_hi, h2):
    """Cubic-spline Hermite evaluation for one multipole.

    y_tbl, m_tbl: (SUB, LANE) vreg-layout knot tables; j: (SUB, LANE)
    flat interval indices (j+1 stays within the padded table)."""
    sub_lo = jnp.right_shift(j, 7)
    lane_lo = jnp.bitwise_and(j, LANE - 1)
    j1 = j + 1
    sub_hi = jnp.right_shift(j1, 7)
    lane_hi = jnp.bitwise_and(j1, LANE - 1)
    y_lo = _gather_vreg(y_tbl, sub_lo, lane_lo)
    y_hi = _gather_vreg(y_tbl, sub_hi, lane_hi)
    m_lo = _gather_vreg(m_tbl, sub_lo, lane_lo)
    m_hi = _gather_vreg(m_tbl, sub_hi, lane_hi)
    return (y_lo * t_hi + y_hi * t_lo
            + h2 * (m_lo * w_lo + m_hi * w_hi))


def _weights(xq, x0, step, n):
    j = jnp.clip(((xq - x0) / step).astype(jnp.int32), 0, n - 2)
    x_lo = x0 + j.astype(xq.dtype) * step
    t_lo = (xq - x_lo) / step
    t_hi = 1.0 - t_lo
    h2 = step * step / 6.0
    w_lo = t_hi * t_hi * t_hi - t_hi
    w_hi = t_lo * t_lo * t_lo - t_lo
    return j, t_lo, t_hi, w_lo, w_hi, h2


def _kernel(x0_step_ref, y_ref, m_ref, xq_ref, leg_ref, out_ref):
    """One query tile.

    x0_step_ref: (1, 4) SMEM — [x0, step, n_knots, h]
    y_ref, m_ref: (L, SUB, LANE) VMEM — vreg-layout knot tables
    xq_ref: (1, SUB, LANE) VMEM — query points (clamped by caller)
    leg_ref: (1, L, SUB, LANE) VMEM — Legendre P_l(mu) per query
    out_ref: (1, SUB, LANE) VMEM — combined output
    """
    x0 = x0_step_ref[0, 0]
    step = x0_step_ref[0, 1]
    n = x0_step_ref[0, 2].astype(jnp.int32)

    xq = xq_ref[0]
    j, t_lo, t_hi, w_lo, w_hi, h2 = _weights(xq, x0, step, n)

    acc = jnp.zeros_like(xq)
    for ell_idx in range(y_ref.shape[0]):
        val = _hermite(y_ref[ell_idx], m_ref[ell_idx], j,
                       t_lo, t_hi, w_lo, w_hi, h2)
        acc = acc + val * leg_ref[0, ell_idx]
    out_ref[0] = acc


def _prepare(logr_knots, xi_knots, m_knots, log_r, legendre_mu):
    """Cast to f32, clamp queries, and compute the uniform-grid scalars."""
    knots = np.asarray(logr_knots)
    n = knots.shape[0]
    if n > TILE:
        raise ValueError(f'n_knots {n} exceeds TILE {TILE}')
    x0 = float(knots[0])
    step = float((knots[-1] - knots[0]) / (n - 1))
    xq = jnp.clip(jnp.asarray(log_r, jnp.float32),
                  np.float32(knots[0]), np.float32(knots[-1]))
    y = jnp.asarray(xi_knots, jnp.float32)
    m = jnp.asarray(m_knots, jnp.float32)
    leg = jnp.asarray(legendre_mu, jnp.float32)
    scalars = jnp.array([[x0, step, float(n), step]], dtype=jnp.float32)
    return n, xq, y, m, leg, scalars


def spline_legendre_combine(logr_knots, xi_knots, m_knots, log_r,
                            legendre_mu, interpret=False):
    """Fused evaluate-and-combine:
        out[q] = sum_l spline_l(log_r[q]) * legendre_mu[l, q]

    logr_knots must be a (host) uniform grid. Traced inputs are cast to
    f32; out-of-range queries are clamped (callers track the oob flag
    separately). Call inside jit — the pallas_call is the kernel.
    """
    n, xq, y, m, leg, scalars = _prepare(
        logr_knots, xi_knots, m_knots, log_r, legendre_mu)
    n_ell = y.shape[0]

    n_q = xq.shape[0]
    pad = (-n_q) % TILE
    num_tiles = (n_q + pad) // TILE
    xq_p = jnp.pad(xq, (0, pad)).reshape(num_tiles, SUB, LANE)
    leg_p = (jnp.pad(leg, ((0, 0), (0, pad)))
             .reshape(n_ell, num_tiles, SUB, LANE).transpose(1, 0, 2, 3))
    y_v = jnp.pad(y, ((0, 0), (0, TILE - n))).reshape(n_ell, SUB, LANE)
    m_v = jnp.pad(m, ((0, 0), (0, TILE - n))).reshape(n_ell, SUB, LANE)

    out = pl.pallas_call(
        _kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_ell, SUB, LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ell, SUB, LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_ell, SUB, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles, SUB, LANE),
                                       jnp.float32),
        interpret=interpret,
    )(scalars, y_v, m_v, xq_p, leg_p)
    return out.reshape(-1)[:n_q]


def _batched_kernel(x0_step_ref, y_ref, m_ref, xq_ref, leg_ref, out_ref):
    """Batched variant: blocks carry a leading singleton batch index."""
    x0 = x0_step_ref[0, 0]
    step = x0_step_ref[0, 1]
    n = x0_step_ref[0, 2].astype(jnp.int32)

    xq = xq_ref[0, 0]
    j, t_lo, t_hi, w_lo, w_hi, h2 = _weights(xq, x0, step, n)

    acc = jnp.zeros_like(xq)
    for ell_idx in range(y_ref.shape[1]):
        val = _hermite(y_ref[0, ell_idx], m_ref[0, ell_idx], j,
                       t_lo, t_hi, w_lo, w_hi, h2)
        acc = acc + val * leg_ref[0, 0, ell_idx]
    out_ref[0, 0] = acc


def spline_legendre_combine_batched(logr_knots, xi_knots, m_knots, log_r,
                                    legendre_mu, interpret=False):
    """Batched fused kernel: xi_knots/m_knots (B, L, N), log_r (B, M),
    legendre_mu (B, L, M) -> (B, M). Grid = (batch, query tiles)."""
    n, xq, y, m, leg, scalars = _prepare(
        logr_knots, xi_knots, m_knots, log_r, legendre_mu)
    n_b, n_ell, n_k = y.shape

    n_q = xq.shape[1]
    pad = (-n_q) % TILE
    num_tiles = (n_q + pad) // TILE
    xq_p = jnp.pad(xq, ((0, 0), (0, pad))).reshape(
        n_b, num_tiles, SUB, LANE)
    leg_p = (jnp.pad(leg, ((0, 0), (0, 0), (0, pad)))
             .reshape(n_b, n_ell, num_tiles, SUB, LANE)
             .transpose(0, 2, 1, 3, 4))
    y_v = jnp.pad(y, ((0, 0), (0, 0), (0, TILE - n_k))).reshape(
        n_b, n_ell, SUB, LANE)
    m_v = jnp.pad(m, ((0, 0), (0, 0), (0, TILE - n_k))).reshape(
        n_b, n_ell, SUB, LANE)

    out = pl.pallas_call(
        _batched_kernel,
        grid=(n_b, num_tiles),
        in_specs=[
            pl.BlockSpec((1, 4), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_ell, SUB, LANE), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_ell, SUB, LANE), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SUB, LANE), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_ell, SUB, LANE),
                         lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, SUB, LANE),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_b, num_tiles, SUB, LANE),
                                       jnp.float32),
        interpret=interpret,
    )(scalars, y_v, m_v, xq_p, leg_p)
    return out.reshape(n_b, -1)[:, :n_q]


def make_vmappable_combine(logr_knots, interpret=False):
    """custom_vmap + custom_vjp wrapper so the fused kernel survives the
    batched likelihood's vmap (the generic pallas vmap rule cannot tile
    these block shapes) AND gradient transforms: the forward pass is the
    Pallas kernel, the backward pass is the vjp of the mathematically
    identical XLA formulation (ops/spline.py) in the same f32 precision
    — the whole combine is piecewise-polynomial, so the two agree to
    float roundoff. This removes the kernel's former gradient-path
    limitation (minimizer/Newton graphs can now keep the fused forward
    in the f32 throughput mode)."""
    from jax.custom_batching import custom_vmap

    from .spline import spline_eval

    @custom_vmap
    def pallas_forward(xi_knots, m_knots, log_r, legendre_mu):
        return spline_legendre_combine(logr_knots, xi_knots, m_knots,
                                       log_r, legendre_mu,
                                       interpret=interpret)

    @pallas_forward.def_vmap
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

    def xla_combine(xi_knots, m_knots, log_r, legendre_mu):
        f32 = jnp.float32
        vals, _ = spline_eval(np.asarray(logr_knots, np.float32),
                              xi_knots.astype(f32)[:, None, :],
                              m_knots.astype(f32)[:, None, :],
                              log_r.astype(f32)[None, :])
        return jnp.sum(vals[:, 0, :] * legendre_mu.astype(f32), axis=0)

    @jax.custom_vjp
    def combine(xi_knots, m_knots, log_r, legendre_mu):
        return pallas_forward(xi_knots, m_knots, log_r, legendre_mu)

    def fwd(xi_knots, m_knots, log_r, legendre_mu):
        out = pallas_forward(xi_knots, m_knots, log_r, legendre_mu)
        return out, (xi_knots, m_knots, log_r, legendre_mu)

    def bwd(residuals, cotangent):
        _, vjp = jax.vjp(xla_combine, *residuals)
        return vjp(cotangent.astype(jnp.float32))

    combine.defvjp(fwd, bwd)
    return combine
