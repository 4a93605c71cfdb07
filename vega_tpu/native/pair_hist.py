"""ctypes bindings for the C++ pair-histogram kernels.

The shared library is compiled on first use with g++ (cached next to the
source keyed by a source hash). When no compiler is available the callers
fall back to the numpy implementation in metals.py — slower and
memory-hungry, but identical results.
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / 'pair_hist.cpp'
_LIB = None
_TRIED = False


def _build_library():
    source = _SRC.read_bytes()
    tag = hashlib.sha1(source).hexdigest()[:12]
    # cache outside the package tree (a raw .so inside the package
    # confuses module discovery tools)
    cache_dir = Path.home() / '.cache' / 'vega_tpu_native'
    cache_dir.mkdir(parents=True, exist_ok=True)
    lib_path = cache_dir / f'pair_hist_{tag}.so'
    if not lib_path.exists():
        cmd = ['g++', '-O3', '-march=native', '-fopenmp', '-shared',
               '-fPIC', str(_SRC), '-o', str(lib_path)]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    return lib_path


def _get_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        lib = ctypes.CDLL(str(_build_library()))
    except (OSError, subprocess.SubprocessError, FileNotFoundError) as exc:
        print(f'WARNING: could not build the native pair-histogram kernel '
              f'({exc}); falling back to numpy.')
        return None

    dptr = ctypes.POINTER(ctypes.c_double)
    lib.pair_histograms.argtypes = (
        [dptr] * 5 + [ctypes.c_int64]      # tracer 1
        + [dptr] * 5 + [ctypes.c_int64]    # tracer 2
        + [ctypes.c_int, ctypes.c_double, ctypes.c_double,
           ctypes.c_double, ctypes.c_double, ctypes.c_int64,
           ctypes.c_double, ctypes.c_double, ctypes.c_int64,
           ctypes.c_double]
        + [dptr] * 6)
    lib.pair_histograms.restype = None

    lib.pair_ratio_range.argtypes = (
        [dptr, dptr, ctypes.c_int64, dptr, dptr, ctypes.c_int64,
         dptr, dptr])
    lib.pair_ratio_range.restype = None
    _LIB = lib
    return _LIB


def native_available():
    return _get_lib() is not None


def _as_c(arr):
    arr = np.ascontiguousarray(arr, dtype=np.float64)
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def pair_ratio_range(true_r1, assumed_r1, true_r2, assumed_r2):
    """(min, max) of (assumed_r1+assumed_r2)/(true_r1+true_r2) over all
    pairs (the auto range of the reference's ratio histogram)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError('native pair_hist unavailable')
    tr1, tr1_p = _as_c(true_r1)
    ar1, ar1_p = _as_c(assumed_r1)
    tr2, tr2_p = _as_c(true_r2)
    ar2, ar2_p = _as_c(assumed_r2)
    out_min = ctypes.c_double()
    out_max = ctypes.c_double()
    lib.pair_ratio_range(tr1_p, ar1_p, len(tr1), tr2_p, ar2_p, len(tr2),
                         ctypes.byref(out_min), ctypes.byref(out_max))
    return out_min.value, out_max.value


def pair_histograms(true_r1, assumed_r1, true_z1, assumed_z1, w1,
                    true_r2, assumed_r2, true_z2, assumed_z2, w2,
                    abs_rp, zmin, zmax, rp_edges, ratio_edges,
                    rp_ratio_cut=20.0):
    """Streamed pair histograms; see pair_hist.cpp for definitions.

    Returns (h2, sum_true, sum_assumed, sum_assumed_rp, sum_z, ratio_hist).
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError('native pair_hist unavailable')

    tr1, tr1_p = _as_c(true_r1)
    ar1, ar1_p = _as_c(assumed_r1)
    tz1, tz1_p = _as_c(true_z1)
    az1, az1_p = _as_c(assumed_z1)
    ww1, w1_p = _as_c(w1)
    tr2, tr2_p = _as_c(true_r2)
    ar2, ar2_p = _as_c(assumed_r2)
    tz2, tz2_p = _as_c(true_z2)
    az2, az2_p = _as_c(assumed_z2)
    ww2, w2_p = _as_c(w2)

    rp_edges = np.asarray(rp_edges, dtype=np.float64)
    n_rp = len(rp_edges) - 1
    if ratio_edges is not None:
        ratio_edges = np.asarray(ratio_edges, dtype=np.float64)
        n_ratio = len(ratio_edges) - 1
        ratio_min, ratio_max = float(ratio_edges[0]), float(ratio_edges[-1])
    else:
        n_ratio = 0
        ratio_min = ratio_max = 0.0

    h2 = np.zeros((n_rp, n_rp))
    sum_true = np.zeros(n_rp)
    sum_assumed = np.zeros(n_rp)
    sum_assumed_rp = np.zeros(n_rp)
    sum_z = np.zeros(n_rp)
    ratio_hist = np.zeros(max(n_ratio, 1))

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    lib.pair_histograms(
        tr1_p, ar1_p, tz1_p, az1_p, w1_p, len(tr1),
        tr2_p, ar2_p, tz2_p, az2_p, w2_p, len(tr2),
        int(abs_rp), float(zmin), float(zmax),
        float(rp_edges[0]), float(rp_edges[-1]), n_rp,
        ratio_min, ratio_max, n_ratio, float(rp_ratio_cut),
        ptr(h2), ptr(sum_true), ptr(sum_assumed), ptr(sum_assumed_rp),
        ptr(sum_z), ptr(ratio_hist))

    return (h2, sum_true, sum_assumed, sum_assumed_rp, sum_z,
            ratio_hist[:n_ratio] if n_ratio else None)
