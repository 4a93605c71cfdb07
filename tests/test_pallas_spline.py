"""Pallas fused spline+Legendre kernel vs the XLA reference path
(interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vega_tpu.ops.pallas_spline import spline_legendre_combine
from vega_tpu.ops.spline import (
    notaknot_second_derivative_matrix, spline_eval)


def test_matches_xla_path():
    rng = np.random.default_rng(0)
    n_knots, n_ell, n_q = 256, 4, 2500
    knots = np.linspace(-3.0, 8.0, n_knots)
    y = rng.normal(size=(n_ell, n_knots))
    s_mat = notaknot_second_derivative_matrix(knots)
    m = y @ s_mat.T
    xq = rng.uniform(-3.0, 8.0, n_q)
    leg = rng.normal(size=(n_ell, n_q))

    # XLA reference (f32 to match the kernel's precision)
    vals, _ = spline_eval(jnp.asarray(knots, jnp.float32),
                          jnp.asarray(y, jnp.float32)[:, None, :],
                          jnp.asarray(m, jnp.float32)[:, None, :],
                          jnp.asarray(xq, jnp.float32)[None, :])
    expected = np.sum(np.asarray(vals[:, 0, :]) * leg.astype(np.float32),
                      axis=0)

    out = spline_legendre_combine(knots, y, m, xq, leg, interpret=True)
    np.testing.assert_allclose(np.asarray(out), expected,
                               rtol=2e-4, atol=2e-4)


def test_query_count_not_tile_multiple():
    rng = np.random.default_rng(1)
    knots = np.linspace(0.0, 1.0, 64)
    y = rng.normal(size=(2, 64))
    s_mat = notaknot_second_derivative_matrix(knots)
    m = y @ s_mat.T
    xq = rng.uniform(0, 1, 777)
    leg = np.ones((2, 777))
    out = spline_legendre_combine(knots, y, m, xq, leg, interpret=True)
    assert out.shape == (777,)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_batched_kernel_matches_single():
    rng = np.random.default_rng(3)
    from vega_tpu.ops.pallas_spline import (
        make_vmappable_combine, spline_legendre_combine_batched)
    import jax

    knots = np.linspace(-2.0, 6.0, 128)
    s_mat = notaknot_second_derivative_matrix(knots)
    n_b, n_ell, n_q = 3, 4, 900
    ys = rng.normal(size=(n_b, n_ell, 128))
    ms = np.einsum('ij,blj->bli', s_mat, ys)
    xqs = rng.uniform(-2, 6, (n_b, n_q))
    legs = rng.normal(size=(n_b, n_ell, n_q))

    batched = spline_legendre_combine_batched(knots, ys, ms, xqs, legs,
                                              interpret=True)
    for b in range(n_b):
        single = spline_legendre_combine(knots, ys[b], ms[b], xqs[b],
                                         legs[b], interpret=True)
        np.testing.assert_allclose(np.asarray(batched[b]),
                                   np.asarray(single), rtol=1e-5,
                                   atol=1e-5)

    # the custom_vmap rule routes vmap onto the batched kernel
    combine = make_vmappable_combine(knots, interpret=True)
    vmapped = jax.vmap(combine)(jnp.asarray(ys), jnp.asarray(ms),
                                jnp.asarray(xqs), jnp.asarray(legs))
    np.testing.assert_allclose(np.asarray(vmapped), np.asarray(batched),
                               rtol=1e-6, atol=1e-6)


def test_combine_gradients_match_xla():
    """The custom VJP (pallas forward, XLA-formulation backward) agrees
    with differentiating the plain XLA spline path."""
    import jax
    import jax.numpy as jnp
    from vega_tpu.ops.pallas_spline import make_vmappable_combine
    from vega_tpu.ops.spline import spline_eval

    rng = np.random.default_rng(0)
    n_knots, n_q, n_ell = 64, 100, 4
    knots = np.linspace(0.0, 1.0, n_knots)
    y = rng.normal(size=(n_ell, n_knots)).astype(np.float32)
    m = rng.normal(size=(n_ell, n_knots)).astype(np.float32)
    # keep queries in the interior of knot intervals: at an interval
    # EDGE the pallas kernel and the XLA path may pick neighboring
    # intervals in f32 (values are continuous there, but the
    # gather-slot gradients w.r.t. the knot tables land in adjacent
    # entries)
    step = 1.0 / (n_knots - 1)
    cells = rng.integers(1, n_knots - 2, size=n_q)
    frac = rng.uniform(0.25, 0.75, size=n_q)
    xq = ((cells + frac) * step).astype(np.float32)
    leg = rng.normal(size=(n_ell, n_q)).astype(np.float32)

    combine = make_vmappable_combine(knots, interpret=True)

    def loss_pallas(y, m, xq, leg):
        return jnp.sum(combine(y, m, xq, leg) ** 2)

    def loss_xla(y, m, xq, leg):
        vals, _ = spline_eval(knots.astype(np.float32),
                              y[:, None, :], m[:, None, :], xq[None, :])
        return jnp.sum(jnp.sum(vals[:, 0, :] * leg, axis=0) ** 2)

    grads_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(y, m, xq, leg)
    grads_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(y, m, xq, leg)
    for gp, gx in zip(grads_p, grads_x):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-4, atol=1e-4)
