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
- end-to-end: grid-collapse chi^2 with VEGA_TPU_DS_MATMUL=1 agrees
  with the exact-f64 grid path at the measured ~1e-4 RELATIVE level
  (the payload norms are set by the domain-edge chi^2, so the DS error
  scales with chi^2 — this is why the mode is opt-in, not default; see
  ops/ds_matmul.py).

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
        # f32 accumulation error, norm-scaled; 1e-6 is ~17x 2^-24
        assert _norm_scaled_err(out, ref) < 1e-6


def test_ds_matmul_chunking_consistency():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(8, 1000))
    b = rng.normal(size=(1000, 32))
    ref = a @ b
    for chunk in (128, 512, 4096):
        out = np.asarray(ds_matmul(a, b, chunk=chunk))
        assert _norm_scaled_err(out, ref) < 1e-6


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
    # measured on this setup (default +-0.25 domain, 64 nodes/dim):
    # max relative error ~1.1e-4 — the error scales with the chi^2
    # magnitude because the payload norms are set by the domain-edge
    # chi^2; ~4x headroom on the measured value
    np.testing.assert_allclose(ds, exact, rtol=4e-4, atol=1.5e-2)
