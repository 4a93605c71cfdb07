"""Grid collapse: the factored quadratic form as a function of the
nonlinear scale parameters.

The basis collapse (vega_tpu/factored.py, VegaInterface.get_collapsed)
removes all grid-sized work from the per-evaluation chi^2 graph whenever
the sampled parameters enter the model only through scalar coefficients.
Sampling (alpha_par, alpha_perp) — the BAO regime — breaks that: the AP
rescaling moves the spline evaluation points of the Pk->xi transform
(reference: correlation_func.py:200-236), so the basis rows themselves
become functions of a small set of "grid parameters" g (ap/at or any
other scale parametrisation, drp_* shifts).

This module extends the collapse to that regime. The model stays LINEAR
in the coefficient vector c; only the basis moves with g:

    xi(c, g)   = c @ V(g)
    chi2(c, g) = d'Ci d - 2 c.(V(g) Ci d) + c.(V(g) Ci V(g)') c
               = s(g) - 2 dc.y(g) + dc.A(g) dc          (centered on c0)

with A(g) = V Ci V' (T, T), y(g) = V Ci d - A c0, s(g) = chi2(c0, g) —
all smooth functions of the one-to-three grid parameters. The collapse
sweep evaluates them EXACTLY at a tensor grid of Chebyshev-Gauss nodes
(one vmapped run of the standard collapse graph under a `grid_trace`
context, so the factored classification treats the node tracers as
row-safe), Chebyshev-transforms the node tensors, and compresses the
(coefficient, payload) matrix with an SVD. Each likelihood evaluation
then costs:

    t_d  = Chebyshev values of the normalized g_d       (sum(Q_d) flops)
    psi  = prod_d t_d[modes[d]]                         (M kept modes)
    phi  = psi @ B                                      (M x R)
    p    = phi @ F                                      (R x (T^2+T+1))
    chi2 = s - 2 dc.y + dc.(A dc)                       (T^2)

where M is the number of RETAINED tensor-product Chebyshev modes after
the error-budgeted truncation (see build_grid_payload: the transformed
spectrum decays fast, so M is a few hundred even when prod(Q_d) = 4096)

— a few hundred kFLOP instead of the ~73 MFLOP dense path (spline +
distortion matmul + masked-covariance quadratic form per evaluation),
putting the BAO-sampled regime on the same footing as the nuisance-only
collapse. Values match the dense pipeline to the Chebyshev interpolation
error, measured by tests/test_grid_collapse.py and reported in
docs/performance.md; outside the node domain the evaluation returns the
chi^2 = 1e100 penalty (the same semantics as the reference's
VegaBoundsError for out-of-range interpolation).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class


# Sampled parameters that move basis rows instead of coefficients
# (reference: scale_parameters.py:12-230 for the alpha parametrisations,
# correlation_func.py:64-69 for drp). Everything else that breaks the
# factored classification (sigma NL, HCD scales, smoothings...) can be
# designated explicitly via [control] grid-params.
ALPHA_LIKE = {
    'ap', 'at', 'aiso', 'epsilon', 'phi', 'alpha',
    'ap_full', 'at_full', 'aiso_full', 'epsilon_full',
    'phi_full', 'alpha_full', 'phi_smooth', 'alpha_smooth',
}


def is_known_grid_param(name):
    return (name in ALPHA_LIKE or name.startswith('alpha_smooth_')
            or name.startswith('drp_'))


@register_pytree_node_class
class GridSpec:
    """Static description of the node grid: parameter names, domains,
    per-dimension node counts and the reference values substituted into
    the coefficient trace. Everything lives in pytree aux_data, so the
    spec rides through jit as (hashable) structure, not as arrays."""

    def __init__(self, names, lo, hi, degrees, ref):
        self.names = tuple(names)
        self.lo = tuple(float(v) for v in lo)
        self.hi = tuple(float(v) for v in hi)
        self.degrees = tuple(int(d) for d in degrees)
        self.ref = tuple(float(v) for v in ref)

    @property
    def n_nodes(self):
        return int(np.prod(self.degrees))

    def tree_flatten(self):
        return (), (self.names, self.lo, self.hi, self.degrees, self.ref)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux)

    def __repr__(self):
        dims = ', '.join(
            f'{n}: [{lo:.4g}, {hi:.4g}] x{d}'
            for n, lo, hi, d in zip(self.names, self.lo, self.hi,
                                    self.degrees))
        return f'GridSpec({dims})'


# --------------------------------------------------------------------------
# Chebyshev machinery (host side)
# --------------------------------------------------------------------------
def cheb_nodes(n):
    """Chebyshev-Gauss points on (-1, 1), ascending."""
    k = np.arange(n)
    return np.sort(np.cos((2 * k + 1) * np.pi / (2 * n)))


def cheb_transform_matrix(n):
    """(n, n) matrix M with a = M @ f mapping values at `cheb_nodes(n)`
    to Chebyshev coefficients (exact for polynomials of degree < n)."""
    x = cheb_nodes(n)
    theta = np.arccos(x)
    k = np.arange(n)[:, None]
    mat = np.cos(k * theta[None, :]) * (2.0 / n)
    mat[0] *= 0.5
    return mat


def cheb_values(x, n):
    """T_0(x) .. T_{n-1}(x) by the three-term recurrence (traceable)."""
    vals = [jnp.ones_like(x), x]
    for _ in range(2, n):
        vals.append(2 * x * vals[-1] - vals[-2])
    return jnp.stack(vals[:n])


# --------------------------------------------------------------------------
# Per-evaluation graph helpers (traceable)
# --------------------------------------------------------------------------
# chi^2 wall strength outside the node domain, per unit of squared
# normalized excess (half-domain-widths). Chosen so the wall dwarfs any
# physical chi^2 within ~1% of a domain width while staying FINITE and
# smooth: a hard 1e100 penalty destroys Wolfe line searches (the first
# L-BFGS trial step often lands outside the domain and the interpolating
# line search diverges on the cliff), whereas the quadratic wall pushes
# optimizers back inside. The dense pipeline's out-of-bounds points keep
# the reference's 1e100 semantics — only the grid-domain boundary is
# softened, and only because it is an artifact of the node domain, not
# of the model.
GRID_WALL_CHI2 = 1e8


def grid_tvecs(spec, sample_params):
    """Per-dimension Chebyshev basis values for one evaluation point.

    Returns (tvecs, excess): tvecs is a tuple of per-dimension value
    vectors T_0..T_{deg-1} evaluated at the domain-clamped normalized
    point; excess is the summed squared normalized distance outside the
    domain (0 inside), which the chi^2 graph turns into the smooth
    GRID_WALL_CHI2 boundary wall. The full tensor basis is never
    materialized per evaluation — each correlation gathers only its
    retained modes (psi_from_modes), so the per-eval basis cost is
    O(sum(deg) + n_kept_modes) instead of O(prod(deg)).
    """
    tvecs = []
    excess = jnp.asarray(0.0)
    for name, lo, hi, deg in zip(spec.names, spec.lo, spec.hi,
                                 spec.degrees):
        x = (2.0 * sample_params[name] - (lo + hi)) / (hi - lo)
        excess = excess + jnp.maximum(jnp.abs(x) - 1.0, 0.0) ** 2
        tvecs.append(cheb_values(jnp.clip(x, -1.0, 1.0), deg))
    return tuple(tvecs), excess


def psi_from_modes(tvecs, modes):
    """Tensor-basis values of the retained Chebyshev modes.

    modes is an int32 (D, M) array of per-dimension mode indices
    (unraveled rows of the node tensor); returns the (M,) vector
    psi_m = prod_d T_{modes[d, m]}(x_d) — D gathers of M elements each
    instead of the N = prod(deg) outer-product kron.
    """
    psi = tvecs[0][modes[0]]
    for d in range(1, len(tvecs)):
        psi = psi * tvecs[d][modes[d]]
    return psi


def ds_matmul_default():
    """Construction-time default for the double-single MXU payload
    contractions (vega_tpu/ops/ds_matmul.py): OFF unless
    VEGA_TPU_DS_MATMUL=1 is set when the VegaInterface is built, or
    [control] ds-matmul = True. This function is called ONCE at
    interface construction (never inside a traced graph), so flipping
    the env var afterwards has no effect — toggle
    ``VegaInterface.use_ds_matmul`` instead, which raises if a grid
    chi^2 graph has already been compiled with the other setting.

    Measured on the v5e (2026-08-19, reference DR16 config, batch
    2048): +24% throughput — the hot loop is dominated by per-call
    dispatch/transfer over this image's TPU tunnel, not by the matmul
    FLOPs the DS scheme accelerates — at a measured chi^2 error of
    ~1e-4 RELATIVE (the payload norms grow toward the node-domain
    edges, so the f32-accumulation error scales with the domain-edge
    chi^2, not the center value; tests/test_ds_matmul.py pins the
    bound). That accuracy trade is not worth 24% by default; enable it
    for sampler-grade throughput runs where |delta log L| ~ 0.1 is
    acceptable. Gradient / Hessian graphs used by the minimizer always
    take the exact f64 path regardless (``exact_grid=True`` in
    VegaInterface's derivative providers).
    """
    return os.environ.get('VEGA_TPU_DS_MATMUL', '0') == '1'


def grid_corr_chi2(corr_payload, tvecs, coeffs, use_ds=False):
    """chi^2 contribution of one correlation from its grid payload.

    The two payload contractions hold essentially all the FLOPs of a
    BAO-regime evaluation; with ``use_ds=True`` they run as
    double-single f32 MXU products (see ds_matmul_default for the
    measured speed/accuracy trade), by default as exact f64 dots.
    ``use_ds`` is a trace-time Python bool — the caller
    (VegaInterface._chi2_graph) resolves it from the interface-level
    setting, never from the environment inside the trace.
    """
    c_ref = corr_payload['cref']
    t = c_ref.shape[0]
    dc = coeffs - c_ref
    psi = psi_from_modes(tvecs, corr_payload['modes'])
    if use_ds:
        from .ops.ds_matmul import ds_matmul
        p = ds_matmul(ds_matmul(psi, corr_payload['B']),
                      corr_payload['F'])
    else:
        p = (psi @ corr_payload['B']) @ corr_payload['F']
    a_mat = p[:t * t].reshape(t, t)
    y = p[t * t:t * t + t]
    s = p[t * t + t]
    return s - 2.0 * (dc @ y) + dc @ (a_mat @ dc)


# --------------------------------------------------------------------------
# Payload disk cache
# --------------------------------------------------------------------------
# Bump when the payload format or the sweep semantics change.
PAYLOAD_CACHE_VERSION = 2


def payload_fingerprint(vega, sample_names, spec, mode_budget, svd_tol):
    """Content hash of everything the grid payload depends on: the full
    resolved configuration, the external array content the config only
    names by path (fiducial Pk template, distortion matrices, metal
    matrices and their coordinate grids — so swapping a file's content
    at the same path invalidates the cache), the active data vectors and
    masked inverse covariances, ALL current parameter values (the node
    sweep bakes every non-sampled parameter into the payload via the
    local-param resolution, not just the sampled ones), the
    float-precision mode, the node spec, and the truncation/compression
    knobs. Deliberately NOT hashed: the process-global statics registry,
    which would make the fingerprint depend on unrelated interfaces
    built earlier in the same process.

    A matching fingerprint implies a bit-identical payload (the sweep is
    deterministic), so sampler / scan / MC driver processes of the same
    fit skip the one-time node sweep entirely (~200 s at the shipped
    32x32 default on a 1-core host) and go straight to compile."""
    import hashlib
    import io

    import jax

    h = hashlib.blake2b(digest_size=20)
    h.update(str(PAYLOAD_CACHE_VERSION).encode())

    def eat(label, arr):
        h.update(label.encode())
        arr = np.ascontiguousarray(arr)
        h.update(repr((arr.shape, str(arr.dtype))).encode())
        h.update(arr.tobytes())

    buf = io.StringIO()
    vega.main_config.write(buf)
    for name, item in sorted(vega.corr_items.items()):
        buf.write(f'[[{name}]]\n')
        item.config.write(buf)
    h.update(buf.getvalue().encode())

    # File-backed model constants (content, not path).
    for key in sorted(vega.fiducial):
        val = vega.fiducial[key]
        if isinstance(val, np.ndarray):
            eat(f'fid:{key}', val)
        else:
            h.update(f'fid:{key}={val!r}'.encode())

    for name, vec in sorted(vega._current_data_vecs().items()):
        h.update(name.encode())
        h.update(np.ascontiguousarray(vec).tobytes())
        h.update(np.ascontiguousarray(
            vega.data[name].inv_masked_cov).tobytes())
        corr_data = vega.data[name]
        if corr_data.has_distortion:
            eat(f'{name}:dmat', corr_data.distortion_mat)
        for pair, mat in sorted(getattr(corr_data, 'metal_mats',
                                        {}).items()):
            if mat is not None:
                eat(f'{name}:met:{pair}', mat)
        for pair, coords in sorted(getattr(corr_data, 'metal_coordinates',
                                           {}).items()):
            eat(f'{name}:metrp:{pair}', coords.rp_grid)
            eat(f'{name}:metrt:{pair}', coords.rt_grid)
            eat(f'{name}:metz:{pair}', coords.z_grid)

    # The sweep resolves EVERY parameter through _get_lcl_prms, so a
    # programmatically mutated non-sampled parameter (e.g.
    # vega.params['sigmaNL_par'] = ...) changes the payload: hash them
    # all, not just the sampled names.
    for name in sorted(vega.params):
        h.update(f'{name}={vega.params[name]!r}'.encode())
    # f32-mode payloads must never serve an f64 run (or vice versa).
    h.update(f'x64={bool(jax.config.jax_enable_x64)}'.encode())
    h.update(repr((spec.names, spec.lo, spec.hi, spec.degrees,
                   spec.ref)).encode())
    h.update(repr((float(mode_budget), float(svd_tol),
                   os.environ.get('VEGA_TPU_GRID_PROBES', '512'))).encode())
    return h.hexdigest()


def payload_cache_dir():
    """None when caching is disabled (VEGA_TPU_GRID_CACHE=0)."""
    if os.environ.get('VEGA_TPU_GRID_CACHE', '1') != '1':
        return None
    return os.environ.get(
        'VEGA_TPU_GRID_CACHE_DIR',
        os.path.expanduser('~/.cache/vega_tpu_grid'))


def save_payload(path, payload):
    spec = payload['__grid__']
    arrays = {'__spec__': np.array(
        repr((spec.names, spec.lo, spec.hi, spec.degrees, spec.ref)))}
    for name, corr in payload.items():
        if name == '__grid__':
            continue
        for part, arr in corr.items():
            arrays[f'{name}::{part}'] = arr
    tmp = f'{path}.{os.getpid()}.tmp'
    with open(tmp, 'wb') as fh:
        np.savez(fh, **arrays)          # file object: no suffix magic
    os.replace(tmp, path)


def load_payload(path):
    from ast import literal_eval
    with np.load(path) as data:
        names, lo, hi, degrees, ref = literal_eval(
            str(data['__spec__']))
        payload = {'__grid__': GridSpec(names, lo, hi, degrees, ref)}
        for key in data.files:
            if key == '__spec__':
                continue
            name, part = key.split('::', 1)
            payload.setdefault(name, {})[part] = data[key]
    return payload


def _probe_psi(spec, n_probe, rng):
    """(n_probe, N) tensor-product Chebyshev basis values at a uniform
    probe cloud over the normalized domain (host numpy)."""
    psi = np.ones((n_probe, 1))
    for deg in spec.degrees:
        x = rng.uniform(-1.0, 1.0, size=n_probe)
        tv = np.empty((n_probe, deg))
        tv[:, 0] = 1.0
        if deg > 1:
            tv[:, 1] = x
        for k in range(2, deg):
            tv[:, k] = 2.0 * x * tv[:, k - 1] - tv[:, k - 2]
        psi = (psi[:, :, None] * tv[:, None, :]).reshape(n_probe, -1)
    return psi


def _select_modes(coef, t, spec, mode_budget):
    """Retained-mode indices (ascending) for one correlation's Chebyshev
    coefficient matrix ``coef`` ((n_nodes, t*t + t + 1)).

    Modes are ranked by payload weight and the cutoff is VALIDATED: the
    smallest retained set whose measured pointwise interpolant error at
    a uniform probe cloud stays within ``mode_budget``, where the error
    at a probe x bounds the chi^2 error over |dc| <= 1 as
    |ds(x)| + 2 ||dy(x)|| + ||dA(x)||_F (the Frobenius norm via a
    Johnson-Lindenstrauss sketch). On payloads whose spectrum has a
    coherent tail (e.g. near-noiseless data where the domain-corner
    chi^2 reaches 1e8) this keeps everything — the budget is honored,
    not assumed.
    """
    n_nodes = coef.shape[0]
    if mode_budget <= 0 or n_nodes <= 1:
        return np.arange(n_nodes)
    a_coef = coef[:, :t * t]
    y_coef = coef[:, t * t:t * t + t]
    s_coef = coef[:, t * t + t]
    weight = (np.abs(s_coef) + 2.0 * np.linalg.norm(y_coef, axis=1)
              + np.linalg.norm(a_coef, axis=1))
    order = np.argsort(-weight)                 # strongest first

    n_probe = int(os.environ.get('VEGA_TPU_GRID_PROBES', 512))
    rng = np.random.default_rng(20260819)
    psi = _probe_psi(spec, n_probe, rng)
    n_sketch = min(16, t * t)
    sketch = rng.normal(size=(t * t, n_sketch)) / np.sqrt(n_sketch)
    sens_cols = np.concatenate(
        [s_coef[:, None], 2.0 * y_coef, a_coef @ sketch], axis=1)

    def max_err(n_keep):
        dropped = order[n_keep:]
        if dropped.size == 0:
            return 0.0
        delta = psi[:, dropped] @ sens_cols[dropped]
        return float(np.max(
            np.abs(delta[:, 0])
            + np.linalg.norm(delta[:, 1:1 + t], axis=1)
            + np.linalg.norm(delta[:, 1 + t:], axis=1)))

    lo, hi = 1, n_nodes
    while lo < hi:
        mid = (lo + hi) // 2
        if max_err(mid) <= mode_budget:
            hi = mid
        else:
            lo = mid + 1
    return np.sort(order[:lo])


# --------------------------------------------------------------------------
# The node sweep (host side, one jitted run)
# --------------------------------------------------------------------------
def build_grid_payload(vega, sample_names, grid_names, spec,
                       sweep_chunk=None, svd_tol=None, mode_budget=None):
    """Run the collapse sweep over the node grid and build the
    per-correlation payloads.

    Returns a dict {'__grid__': spec, corr_name: {'B', 'F', 'cref',
    'modes'}} (numpy host arrays; callers ship them as jit arguments).
    Correlations whose model does not stay factored under the grid trace
    are absent — the chi^2 graph evaluates those densely with the true
    traced values.

    mode_budget: per-correlation ABSOLUTE chi^2 error budget for
    Chebyshev mode truncation (_select_modes). The transformed payload
    spectrum decays fast on realistic data (the quadratic form is
    smooth in the scale parameters), so most of the prod(degrees)
    tensor-product modes contribute nothing pointwise: modes are ranked
    by weight and the cutoff is chosen by VALIDATING the truncated
    interpolant against the full one at a probe cloud, keeping the
    measured error within the budget. This cuts the per-eval psi @ B
    contraction from prod(degrees) rows to the retained modes, making
    the wide production domain cheap per evaluation (see
    docs/performance.md for retained counts measured on the reference
    DR16-subset config). Default 2e-4 (env VEGA_TPU_GRID_MODE_BUDGET /
    [control] grid-mode-budget), subdominant to the ~4e-3
    node-convergence error; 0 disables truncation.
    """
    from .factored import grid_trace
    from .statics import STATICS

    if sweep_chunk is None:
        sweep_chunk = int(os.environ.get('VEGA_TPU_GRID_SWEEP_CHUNK', 32))
    if svd_tol is None:
        svd_tol = float(os.environ.get('VEGA_TPU_GRID_SVD_TOL', 1e-12))
    if mode_budget is None:
        mode_budget = float(os.environ.get(
            'VEGA_TPU_GRID_MODE_BUDGET', 2e-4))

    vega._ensure_static_refs()

    # Node tensor (C order: first name outermost)
    axes = [0.5 * (lo + hi) + 0.5 * (hi - lo) * cheb_nodes(deg)
            for lo, hi, deg in zip(spec.lo, spec.hi, spec.degrees)]
    mesh = np.meshgrid(*axes, indexing='ij')
    nodes = np.stack([m.ravel() for m in mesh], axis=-1)   # (N, G)

    base_sampled = {name: float(vega.params.get(name, 0.0))
                    for name in sample_names}
    data_vecs = {name: np.asarray(v)
                 for name, v in vega._current_data_vecs().items()}

    corr_names = list(vega.corr_items)

    def node_fn(gvals, base, dvecs, statics):
        sp = dict(base)
        for i, n in enumerate(spec.names):
            sp[n] = gvals[i]
        with STATICS.bind(statics), grid_trace(spec.names):
            return vega._grid_collapse_node(sp, dvecs)

    def sweep(node_chunks, base, dvecs, statics):
        def one_chunk(chunk):
            # out_axes=None on the coefficient vectors is a structural
            # proof that no coefficient depends on a grid parameter —
            # vmap raises otherwise (the payload tensors would then be
            # inconsistent across nodes).
            return jax.vmap(node_fn, in_axes=(0, None, None, None),
                            out_axes=(0, None, 0))(
                chunk, base, dvecs, statics)
        return jax.lax.map(one_chunk, node_chunks)

    n_nodes = nodes.shape[0]
    pad = (-n_nodes) % sweep_chunk
    nodes_padded = np.pad(nodes, [(0, pad), (0, 0)], mode='edge')
    node_chunks = nodes_padded.reshape(-1, sweep_chunk, nodes.shape[1])

    # Execute on the host CPU backend: runs once, compiles locally in
    # seconds, exact host f64 (same policy as get_collapsed).
    fn = jax.jit(sweep)
    try:
        cpu = jax.devices('cpu')[0]
    except Exception:                                       # pragma: no cover
        cpu = None
    if cpu is not None and jax.default_backend() != 'cpu':
        with jax.default_device(cpu):
            payload_nodes, c0s, bad = fn(
                jnp.asarray(node_chunks), base_sampled, data_vecs,
                STATICS.host_tree())
    else:
        payload_nodes, c0s, bad = fn(
            jnp.asarray(node_chunks), base_sampled, data_vecs,
            STATICS.device_tree())

    bad = np.asarray(bad).reshape(-1)[:n_nodes]
    if bad.any():
        first = nodes[np.argmax(bad)]
        raise ValueError(
            'Grid collapse: the model is out of bounds (spline range or '
            f'non-finite factor) at {int(bad.sum())} of {n_nodes} nodes, '
            f'first at {dict(zip(spec.names, first))}. Narrow the grid '
            'domain ([control] grid-domain-<param> = lo hi) or the '
            'sampling limits.')

    # chunk-level c0 consistency (out_axes=None already proved node-level)
    c0s = {k: np.asarray(v) for k, v in c0s.items()}
    for name, c0 in c0s.items():
        if c0.ndim == 2:
            assert np.allclose(c0[0], c0), \
                f'coefficient vector varies across sweep chunks for {name}'
            c0s[name] = c0[0]

    out = {'__grid__': spec}
    tmats = [cheb_transform_matrix(d) for d in spec.degrees]
    for name in corr_names:
        if name not in payload_nodes:
            continue
        a_nodes = np.asarray(payload_nodes[name]['A'])
        e_nodes = np.asarray(payload_nodes[name]['e'])
        a_nodes = a_nodes.reshape(-1, *a_nodes.shape[-2:])[:n_nodes]
        e_nodes = e_nodes.reshape(-1, e_nodes.shape[-1])[:n_nodes]
        c0 = c0s[name]
        t = c0.shape[0]

        d_masked = data_vecs[name]
        inv_cov = np.asarray(vega.data[name].inv_masked_cov)
        d_ci_d = float(d_masked @ (inv_cov @ d_masked))

        # centered pieces, exact f64 on the host:
        #   y_q = e_q - A_q c0 ;  s_q = chi2(c0, g_q)
        y_nodes = e_nodes - np.einsum('qts,s->qt', a_nodes, c0)
        s_nodes = (d_ci_d - 2.0 * e_nodes @ c0
                   + np.einsum('t,qts,s->q', c0, a_nodes, c0))

        payload = np.concatenate(
            [a_nodes.reshape(n_nodes, t * t), y_nodes,
             s_nodes[:, None]], axis=1)                     # (N, D)

        # node values -> Chebyshev coefficients, one dim at a time
        coef = payload.reshape(tuple(spec.degrees) + (payload.shape[1],))
        for axis, mat in enumerate(tmats):
            coef = np.moveaxis(
                np.tensordot(mat, coef, axes=(1, axis)), 0, axis)
        coef = coef.reshape(n_nodes, -1)

        # Mode truncation, VALIDATED: rank tensor-product Chebyshev
        # modes by payload weight, then choose the smallest retained set
        # whose measured pointwise interpolant error at a probe cloud
        # over the domain stays within the budget. Worst-case coefficient
        # bounds are useless here (the tail coefficients encode the
        # domain-corner chi^2 blow-up coherently and cancel by factors
        # of 1e3+ pointwise), so the cutoff is chosen by direct
        # evaluation: err(x) = psi_dropped(x) @ coef_dropped is exact
        # linear algebra on data already in hand.
        kept = _select_modes(coef, t, spec, mode_budget)
        coef = coef[kept]
        modes = np.stack(np.unravel_index(kept, spec.degrees)
                         ).astype(np.int32)               # (D, M)

        # SVD compression across the retained-mode axis
        u, s, vt = np.linalg.svd(coef, full_matrices=False)
        if s.size and s[0] > 0:
            tail = np.sqrt(np.cumsum(s[::-1] ** 2))[::-1]
            keep = int(np.searchsorted(-tail, -svd_tol * tail[0]))
            rank = max(1, min(s.size, keep if keep > 0 else 1))
        else:                                               # pragma: no cover
            rank = 1
        out[name] = {
            'B': np.ascontiguousarray(u[:, :rank]),
            'F': np.ascontiguousarray(s[:rank, None] * vt[:rank]),
            'cref': c0,
            'modes': modes,
        }
    return out
