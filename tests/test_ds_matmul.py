"""Double-single f32 MXU matmul (vega_tpu/ops/ds_matmul.py).

On TPU the grid-collapse payload contractions run as three chunked f32
matmuls with f64 chunk accumulation instead of emulated-f64 dots (~3
orders of magnitude faster on the MXU). These tests pin the numerics on
the CPU backend, where f32 dot_general also accumulates in f32 — the
same error model as the MXU:

- norm-scaled error bound of the raw primitive (the f32 accumulation
  error dominates: ~sqrt(chunk) * 2^-24 relative to the row scale);
- exactness of the chunked f64 accumulation (chunk boundaries change
  results only at the f32-accumulation level, not the f64 level);
- vmap batching (the production use: per-eval psi vectors lifted to a
  batch matmul);
- end-to-end: grid-collapse chi^2 with DS on (the default) agrees with
  the exact-f64 grid path at the measured ~1e-7 RELATIVE level. The
  split payload is what buys this: only the A block (curvature
  tensors, uniform magnitude over the domain) runs double-single,
  while the (s, y) block — whose norms are set by the domain-EDGE
  chi^2 and used to drag the whole-payload DS error to ~1e-4 relative
  — contracts in exact f64 (gridcollapse.finalize_corr_payload,
  grid_corr_chi2). Measured 2026-08-20 on the synthetic cross config,
  points spanning the full +-0.2 (ap, at) domain: max rel 1.06e-7,
  max abs 1.6e-3 at chi2 ~ 5e5.

The reference has no analogue (pure-numpy f64 on CPU; SURVEY.md
section 2.2) — this is a TPU-hardware consequence.
"""

import tempfile
from pathlib import Path

import numpy as np
import pytest
import jax

from vega_tpu.ops.ds_matmul import ds_matmul


def _norm_scaled_err(out, ref):
    scale = np.linalg.norm(ref, axis=-1, keepdims=True)
    return np.max(np.abs(out - ref) / scale)


def test_ds_matmul_accuracy():
    rng = np.random.default_rng(0)
    for (m, k, n) in [(16, 400, 512), (8, 1100, 64), (4, 37, 5)]:
        a = rng.normal(size=(m, k))
        b = rng.normal(size=(k, n))
        ref = a @ b
        out = np.asarray(ds_matmul(a, b))
        # worst-case f32 accumulation model: sqrt(min(k, chunk)) * 2^-24
        # (~1.35e-6 at chunk=512) with a ~1.5x safety factor for
        # backend-dependent accumulation order
        bound = 1.5 * np.sqrt(min(k, 512)) * 2.0 ** -24
        assert _norm_scaled_err(out, ref) < bound


def test_ds_matmul_chunking_consistency():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(8, 1000))
    b = rng.normal(size=(1000, 32))
    ref = a @ b
    for chunk in (128, 512, 4096):
        out = np.asarray(ds_matmul(a, b, chunk=chunk))
        # sqrt(min(k, chunk)) * 2^-24 with a ~1.5x safety factor
        assert _norm_scaled_err(out, ref) < \
            1.5 * np.sqrt(min(1000, chunk)) * 2.0 ** -24


def test_ds_matmul_vector_and_vmap():
    rng = np.random.default_rng(2)
    b_mat = rng.normal(size=(400, 96))
    x = rng.normal(size=(400,))
    out = np.asarray(ds_matmul(x, b_mat))
    assert _norm_scaled_err(out, x @ b_mat) < 1e-6
    xs = rng.normal(size=(12, 400))
    batched = jax.vmap(lambda v: ds_matmul(v, b_mat))(xs)
    assert _norm_scaled_err(np.asarray(batched), xs @ b_mat) < 1e-6


def test_ds_matmul_f32_passthrough():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(4, 64)).astype(np.float32)
    b = rng.normal(size=(64, 8)).astype(np.float32)
    out = ds_matmul(jax.numpy.asarray(a), jax.numpy.asarray(b))
    assert out.dtype == np.float32
    assert _norm_scaled_err(np.asarray(out), a.astype(np.float64)
                            @ b.astype(np.float64)) < 1e-6


def test_ds_matmul_mixed_dtype_upcasts():
    """One f64 + one f32 operand must take the f64 DS path (returning
    f64 at DS accuracy), not silently degrade to the f32 passthrough."""
    rng = np.random.default_rng(4)
    a64 = rng.normal(size=(8, 400))
    b32 = rng.normal(size=(400, 16)).astype(np.float32)
    out = ds_matmul(jax.numpy.asarray(a64), jax.numpy.asarray(b32))
    assert out.dtype == np.float64
    ref = a64 @ b32.astype(np.float64)
    assert _norm_scaled_err(np.asarray(out), ref) < \
        1.5 * np.sqrt(400) * 2.0 ** -24
    # and the mirrored order
    out2 = ds_matmul(jax.numpy.asarray(b32.T), jax.numpy.asarray(a64.T))
    assert out2.dtype == np.float64


@pytest.mark.slow
def test_use_ds_matmul_resolved_at_construction(monkeypatch):
    """The DS-matmul knob is resolved ONCE when the VegaInterface is
    built ([control] ds-matmul, else VEGA_TPU_DS_MATMUL): later env
    flips are ignored, the property is settable until the first grid
    chi^2 graph compiles, and changing it afterwards raises."""
    from vega_tpu.testing import make_synthetic_dataset
    from vega_tpu.vega_interface import VegaInterface

    workdir = Path(tempfile.mkdtemp(prefix='vega_tpu_dsopt_'))
    sample = {'ap': 'True', 'at': 'True',
              'bias_LYA': 'True', 'beta_LYA': 'True'}
    main_path = make_synthetic_dataset(workdir, cross=False, sample=sample)

    monkeypatch.setenv('VEGA_TPU_DS_MATMUL', '1')
    vega = VegaInterface(main_path)
    assert vega.use_ds_matmul is True
    # env flips after construction are ignored by design
    monkeypatch.setenv('VEGA_TPU_DS_MATMUL', '0')
    assert vega.use_ds_matmul is True
    # settable before any grid graph has compiled
    vega.use_ds_matmul = False
    assert vega.use_ds_matmul is False

    # [control] ds-matmul overrides the environment
    workdir2 = Path(tempfile.mkdtemp(prefix='vega_tpu_dsopt2_'))
    monkeypatch.setenv('VEGA_TPU_DS_MATMUL', '1')
    main_path2 = make_synthetic_dataset(
        workdir2, cross=False, sample=sample,
        extra_control='ds-matmul = False\n')
    vega2 = VegaInterface(main_path2)
    assert vega2.use_ds_matmul is False

    # after a grid chi^2 evaluation the setting is baked into compiled
    # graphs: changing it raises, re-asserting the same value is fine
    point = {'ap': 1.01, 'at': 0.99, 'bias_LYA': -0.117,
             'beta_LYA': 1.67}
    chi2 = vega2.chi2(point)
    assert np.isfinite(chi2)
    vega2.use_ds_matmul = False      # no-op stays allowed
    with pytest.raises(RuntimeError, match='use_ds_matmul'):
        vega2.use_ds_matmul = True


@pytest.mark.slow
def test_grid_chi2_with_ds_matmul(monkeypatch):
    """End-to-end: the DS-matmul grid path tracks the exact-f64 grid
    path at the Chebyshev-ripple scale on a full synthetic setup."""
    from vega_tpu.testing import make_synthetic_dataset
    from vega_tpu.vega_interface import VegaInterface
    from vega_tpu.parallel import BatchedLikelihood

    workdir = Path(tempfile.mkdtemp(prefix='vega_tpu_ds_'))
    sample = {'ap': 'True', 'at': 'True',
              'bias_LYA': 'True', 'beta_LYA': 'True'}
    main_path = make_synthetic_dataset(workdir, cross=True, sample=sample)

    rng = np.random.default_rng(11)
    n = 32
    batches = {'bias_LYA': -0.117 * (1 + 0.02 * rng.normal(size=n)),
               'beta_LYA': 1.67 * (1 + 0.02 * rng.normal(size=n)),
               'ap': 1.0 + 0.02 * rng.normal(size=n),
               'at': 1.0 + 0.02 * rng.normal(size=n)}

    monkeypatch.setenv('VEGA_TPU_DS_MATMUL', '0')
    exact = BatchedLikelihood(VegaInterface(main_path)).chi2(batches)

    monkeypatch.setenv('VEGA_TPU_DS_MATMUL', '1')
    ds = BatchedLikelihood(VegaInterface(main_path)).chi2(batches)

    assert np.all(np.isfinite(ds))
    # measured on this setup with the split payload (A block DS, sy
    # block exact f64): max relative error 1.06e-7 over points spanning
    # the full domain (2026-08-20) — the near-center points used here
    # sit below that; ~10x headroom on the measured value
    np.testing.assert_allclose(ds, exact, rtol=1e-6, atol=1e-3)
