"""Double-single (two-float32) matrix products on the MXU.

TPUs have no f64 matmul hardware: with x64 enabled, XLA lowers f64
`dot_general` to a software emulation that runs at O(100) GFLOP/s on a
v5e — ~3 orders of magnitude below the chip's f32 matmul throughput.
The grid-collapse chi^2 (vega_tpu/gridcollapse.py) spends essentially
all of its per-evaluation FLOPs in two such matmuls, so the emulated
path sets the BAO-regime throughput ceiling.

This module provides the classic double-single decomposition: split
each f64 operand into an exactly-representable f32 "hi" part and an f32
"lo" remainder,

    a = ah + al   (ah = f32(a), al = f32(a - ah), |al| <= eps32 |a|)

and evaluate

    a @ b  ~=  ah@bh + ah@bl + al@bh

with three f32 matmuls (precision=HIGHEST, i.e. the 6-pass bf16 scheme
that reproduces full f32 multiplies) accumulated in f64. The dropped
al@bl term is O(eps32^2) = O(1e-14) relative — far below the f32
accumulation error, which dominates: the MXU accumulates each f32
product chain in f32, so a contraction of length K carries a
~sqrt(K) * 2^-24 relative error (~1e-6 at K = 1024). To keep that
bounded for long contractions, the K axis is chunked (default 512) and
the per-chunk partial sums are accumulated in f64.

The result is a matmul with ~1e-7..1e-6 norm-scaled accuracy at ~1/3
of the chip's f32 matmul throughput — vs 2^-53 at emulated-f64 speed.
The error is relative to the operand NORMS, which is why the grid
collapse stores its payload as two blocks and routes only the A block
(curvature tensors, uniform magnitude over the node domain, ~97% of
the FLOPs) through this kernel: the (s, y) block's norms are set by
the domain-EDGE chi^2 (which grows quadratically away from the best
fit) and contract in exact f64 instead
(gridcollapse.finalize_corr_payload / grid_corr_chi2). With that
split the measured end-to-end chi^2 error is ~1e-7 relative over the
full default +-0.25 domain (tests/test_ds_matmul.py; whole-payload DS
measured ~1e-4 in round 4) — below the grid path's own Chebyshev
ripple, so DS is ON by default. Because the production hot loop is
dominated by per-call dispatch over this image's TPU tunnel rather
than matmul FLOPs, the measured win is +24% (v5e, batch 2048), not
the ~100x the FLOP ratio would suggest. See ds_matmul_default in
gridcollapse.py and VegaInterface.use_ds_matmul for the control.

Where it is NOT used: the exact collapse (nuisance-only parity path),
the dense pipeline, and every host-side f64 reduction — those keep
full f64 semantics. Reference anchor: the reference has no analogue
(pure-numpy f64 on CPU, SURVEY.md section 2.2); this is a TPU-hardware
consequence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _split(a):
    """Exact double-single split of an f64 array: a == hi + lo with both
    parts f32-representable (lo is the f32 rounding remainder)."""
    hi = a.astype(jnp.float32)
    lo = (a - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def _f32_dot(a, b):
    # HIGHEST on TPU = 6-pass bf16: full-f32 multiplies, f32 accumulate.
    return lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=('chunk',))
def ds_matmul(a, b, chunk=512):
    """a @ b for f64 operands via three chunked f32 MXU products.

    a: (..., K) or (M, K); b: (K, N). Contraction is over the last axis
    of `a` and first of `b` (same convention as jnp.matmul for 2D).
    Returns f64. K is chunked so each f32 accumulation chain stays
    short; chunk partial sums are added in f64.
    """
    if a.dtype != jnp.float64 and b.dtype != jnp.float64:
        # f32 inputs (VEGA_TPU_X64=0 mode): one HIGHEST-precision pass.
        return _f32_dot(a, b).astype(b.dtype)
    if a.dtype != jnp.float64 or b.dtype != jnp.float64:
        # Mixed f64/f32: upcast the f32 operand so the DS path runs and
        # the result honours the f64 operand (its `lo` split is exactly
        # zero, so this costs one matmul of zeros the compiler can DCE,
        # not silent precision loss).
        a = a.astype(jnp.float64)
        b = b.astype(jnp.float64)
    k = a.shape[-1]
    ah, al = _split(a)
    bh, bl = _split(b)

    def partial_dot(lo_idx, width):
        a_h = lax.dynamic_slice_in_dim(ah, lo_idx, width, axis=a.ndim - 1)
        a_l = lax.dynamic_slice_in_dim(al, lo_idx, width, axis=a.ndim - 1)
        b_h = lax.dynamic_slice_in_dim(bh, lo_idx, width, axis=0)
        b_l = lax.dynamic_slice_in_dim(bl, lo_idx, width, axis=0)
        out = (_f32_dot(a_h, b_h).astype(jnp.float64)
               + _f32_dot(a_h, b_l).astype(jnp.float64)
               + _f32_dot(a_l, b_h).astype(jnp.float64))
        return out

    if k <= chunk:
        return partial_dot(0, k)
    n_full = k // chunk
    acc = partial_dot(0, chunk)
    for i in range(1, n_full):
        acc = acc + partial_dot(i * chunk, chunk)
    rem = k - n_full * chunk
    if rem:
        acc = acc + partial_dot(n_full * chunk, rem)
    return acc
