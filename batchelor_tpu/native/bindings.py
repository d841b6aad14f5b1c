"""ctypes bindings to the native C++ host runtime (libbatchelor).

Builds the shared library on first use (g++, cached by source mtime) and
degrades gracefully: every entry point has a pure-numpy fallback, so the
framework works without a toolchain — the native path is the fast one.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "libbatchelor.cpp")
_BUILD_DIR = os.path.join(_HERE, "build")
_SO = os.path.join(_BUILD_DIR, "libbatchelor.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = [
        "g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
        "-march=native", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        try:  # retry without -march=native
            cmd.remove("-march=native")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return _SO
        except Exception:
            return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        i64 = ctypes.c_int64
        lib.bt_mutual_nn.restype = i64
        lib.bt_mutual_nn.argtypes = [i32p, i64, i64, i32p, i64, i64, i32p, i32p, i64]
        lib.bt_union_find.restype = None
        lib.bt_union_find.argtypes = [i64, i64p, i64, i64p]
        lib.bt_csr_densify.restype = None
        lib.bt_csr_densify.argtypes = [f32p, i32p, i64p, i64, i64, i64, f32p]
        lib.bt_csr_row_sums.restype = None
        lib.bt_csr_row_sums.argtypes = [f32p, i64p, i64, f64p]
        lib.bt_csr_select_columns.restype = i64
        lib.bt_csr_select_columns.argtypes = [
            f32p, i32p, i64p, i64, i32p, f32p, i32p, i64p,
        ]
        f64 = ctypes.c_double
        lib.bt_csr_lognorm_cosine.restype = None
        lib.bt_csr_lognorm_cosine.argtypes = [
            f32p, i64p, i64, f32p, f64, ctypes.c_int, f32p,
        ]
        lib.bt_csr_unlog_colsums.restype = None
        lib.bt_csr_unlog_colsums.argtypes = [f32p, i32p, i64, i64, f64, f64p]
        lib.bt_csr_rescale.restype = None
        lib.bt_csr_rescale.argtypes = [f32p, i32p, i64, f64p, f64, f32p]
        lib.bt_csr_gene_stats.restype = None
        lib.bt_csr_gene_stats.argtypes = [
            f32p, i32p, i64p, i64, i64, f32p, f64, f64p, f64p, f64p,
        ]
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def mutual_nn_pairs(l2r: np.ndarray, r2l: np.ndarray):
    """Mutual pair lists from two kNN index matrices (0-based; the native
    replacement for the device membership test when indices are already on
    host). Returns (first, second) ordered by left cell then rank."""
    l2r = np.ascontiguousarray(l2r, dtype=np.int32)
    r2l = np.ascontiguousarray(r2l, dtype=np.int32)
    n1, k2 = l2r.shape
    n2, k1 = r2l.shape
    lib = get_lib()
    if lib is not None:
        total = lib.bt_mutual_nn(
            _ptr(l2r, ctypes.c_int32), n1, k2, _ptr(r2l, ctypes.c_int32), n2, k1,
            None, None, 0,
        )
        first = np.empty(total, dtype=np.int32)
        second = np.empty(total, dtype=np.int32)
        lib.bt_mutual_nn(
            _ptr(l2r, ctypes.c_int32), n1, k2, _ptr(r2l, ctypes.c_int32), n2, k1,
            _ptr(first, ctypes.c_int32), _ptr(second, ctypes.c_int32), total,
        )
        return first.astype(np.int64), second.astype(np.int64)
    # numpy fallback
    sets = [set(row.tolist()) for row in r2l]
    firsts, seconds = [], []
    for i in range(n1):
        for j in l2r[i]:
            if i in sets[j]:
                firsts.append(i)
                seconds.append(int(j))
    return np.asarray(firsts, dtype=np.int64), np.asarray(seconds, dtype=np.int64)


def union_find(n: int, edges: np.ndarray) -> np.ndarray:
    """Connected-component labels in first-appearance order."""
    edges = np.ascontiguousarray(edges, dtype=np.int64).reshape(-1, 2)
    lib = get_lib()
    if lib is not None:
        labels = np.empty(n, dtype=np.int64)
        lib.bt_union_find(
            n, _ptr(edges, ctypes.c_int64), edges.shape[0],
            _ptr(labels, ctypes.c_int64),
        )
        return labels
    from ..correct.cluster_mnn import _union_find_py

    return _union_find_py(n, edges)


def csr_densify(data, indices, indptr, row_start, row_end, ncols) -> np.ndarray:
    """Dense row-major block of CSR rows [row_start, row_end)."""
    data = np.ascontiguousarray(data, dtype=np.float32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    out = np.empty((row_end - row_start, ncols), dtype=np.float32)
    lib = get_lib()
    if lib is not None:
        lib.bt_csr_densify(
            _ptr(data, ctypes.c_float), _ptr(indices, ctypes.c_int32),
            _ptr(indptr, ctypes.c_int64), row_start, row_end, ncols,
            _ptr(out, ctypes.c_float),
        )
        return out
    out[:] = 0
    for r in range(row_start, row_end):
        sl = slice(indptr[r], indptr[r + 1])
        out[r - row_start, indices[sl]] = data[sl]
    return out


def csr_row_sums(data, indptr, nrows) -> np.ndarray:
    data = np.ascontiguousarray(data, dtype=np.float32)
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    lib = get_lib()
    if lib is not None:
        out = np.empty(nrows, dtype=np.float64)
        lib.bt_csr_row_sums(
            _ptr(data, ctypes.c_float), _ptr(indptr, ctypes.c_int64), nrows,
            _ptr(out, ctypes.c_double),
        )
        return out
    return np.add.reduceat(
        data.astype(np.float64), indptr[:-1]
    ) * (np.diff(indptr) > 0)


def csr_select_columns(data, indices, indptr, col_map):
    """CSR with columns remapped/dropped per col_map (new id or -1)."""
    data = np.ascontiguousarray(data, dtype=np.float32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    col_map = np.ascontiguousarray(col_map, dtype=np.int32)
    nrows = indptr.shape[0] - 1
    lib = get_lib()
    if lib is not None:
        nnz = lib.bt_csr_select_columns(
            _ptr(data, ctypes.c_float), _ptr(indices, ctypes.c_int32),
            _ptr(indptr, ctypes.c_int64), nrows, _ptr(col_map, ctypes.c_int32),
            None, None, None,
        )
        out_data = np.empty(nnz, dtype=np.float32)
        out_indices = np.empty(nnz, dtype=np.int32)
        out_indptr = np.empty(nrows + 1, dtype=np.int64)
        lib.bt_csr_select_columns(
            _ptr(data, ctypes.c_float), _ptr(indices, ctypes.c_int32),
            _ptr(indptr, ctypes.c_int64), nrows, _ptr(col_map, ctypes.c_int32),
            _ptr(out_data, ctypes.c_float), _ptr(out_indices, ctypes.c_int32),
            _ptr(out_indptr, ctypes.c_int64),
        )
        return out_data, out_indices, out_indptr
    keep = col_map[indices] >= 0
    out_data = data[keep]
    out_indices = col_map[indices[keep]]
    counts = np.add.reduceat(keep.astype(np.int64), indptr[:-1])
    counts = counts * (np.diff(indptr) > 0)
    out_indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return out_data, out_indices.astype(np.int32), out_indptr


def csr_lognorm_cosine(data, indptr, sf, log_base, cos_norm) -> np.ndarray:
    """Threaded v -> log(v/sf_row + 1)/log(base) [+ per-row L2 norm] over
    the nnz buffer; numpy fallback preserves exact semantics."""
    data = np.ascontiguousarray(data, dtype=np.float32)
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    sf = np.ascontiguousarray(sf, dtype=np.float32)
    nrows = indptr.shape[0] - 1
    lib = get_lib()
    if lib is not None:
        out = np.empty_like(data)
        lib.bt_csr_lognorm_cosine(
            _ptr(data, ctypes.c_float), _ptr(indptr, ctypes.c_int64), nrows,
            _ptr(sf, ctypes.c_float), float(log_base), int(bool(cos_norm)),
            _ptr(out, ctypes.c_float),
        )
        return out
    counts = np.diff(indptr)
    row_sf = np.repeat(sf.astype(np.float64), counts)
    vals = np.log1p(data.astype(np.float64) / row_sf) / np.log(log_base)
    if cos_norm:
        sq = np.zeros(nrows, np.float64)
        nz = counts > 0
        starts = indptr[:-1][nz]
        if starts.size:
            sq[nz] = np.add.reduceat(vals * vals, starts)
        l2 = np.maximum(np.sqrt(sq), 1e-8)
        vals = vals / np.repeat(l2, counts)
    return vals.astype(np.float32)


def csr_unlog_colsums(data, indices, ncols, log_base) -> np.ndarray:
    """Per-gene sums of (base^v - 1) over the nnz buffer (count-space
    column sums of a logged CSR matrix)."""
    data = np.ascontiguousarray(data, dtype=np.float32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    lib = get_lib()
    if lib is not None:
        out = np.empty(ncols, dtype=np.float64)
        lib.bt_csr_unlog_colsums(
            _ptr(data, ctypes.c_float), _ptr(indices, ctypes.c_int32),
            data.shape[0], ncols, float(log_base), _ptr(out, ctypes.c_double),
        )
        return out
    u = np.expm1(data.astype(np.float64) * np.log(log_base))
    return np.bincount(indices, weights=u, minlength=ncols)


def csr_gene_stats(data, indices, indptr, sf, ncols, log_base):
    """Per-gene (sum of v/sf, sum of log-normalized, sum of squares) over
    the nnz buffer — one threaded O(nnz) pass; the host-side substrate of
    quick_correct_csr stages 1-3 (no device transfer at all). Returns
    float64 (avg_sums, log_sums, log_sq_sums) of length ncols."""
    data = np.ascontiguousarray(data, dtype=np.float32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    sf = np.ascontiguousarray(sf, dtype=np.float32)
    nrows = indptr.shape[0] - 1
    lib = get_lib()
    if lib is not None:
        avg = np.empty(ncols, dtype=np.float64)
        s1 = np.empty(ncols, dtype=np.float64)
        s2 = np.empty(ncols, dtype=np.float64)
        lib.bt_csr_gene_stats(
            _ptr(data, ctypes.c_float), _ptr(indices, ctypes.c_int32),
            _ptr(indptr, ctypes.c_int64), nrows, ncols,
            _ptr(sf, ctypes.c_float), float(log_base),
            _ptr(avg, ctypes.c_double), _ptr(s1, ctypes.c_double),
            _ptr(s2, ctypes.c_double),
        )
        return avg, s1, s2
    counts = np.diff(indptr)
    row_sf = np.repeat(sf.astype(np.float64), counts)
    norm = data.astype(np.float64) / row_sf
    lg = np.log1p(norm) / np.log(log_base)
    avg = np.bincount(indices, weights=norm, minlength=ncols)
    s1 = np.bincount(indices, weights=lg, minlength=ncols)
    s2 = np.bincount(indices, weights=lg * lg, minlength=ncols)
    return avg, s1, s2


def csr_rescale_values(data, indices, scale, log_base) -> np.ndarray:
    """Threaded v -> log1p((base^v - 1) * scale[gene]) / log(base)."""
    data = np.ascontiguousarray(data, dtype=np.float32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    scale = np.ascontiguousarray(scale, dtype=np.float64)
    lib = get_lib()
    if lib is not None:
        out = np.empty_like(data)
        lib.bt_csr_rescale(
            _ptr(data, ctypes.c_float), _ptr(indices, ctypes.c_int32),
            data.shape[0], _ptr(scale, ctypes.c_double), float(log_base),
            _ptr(out, ctypes.c_float),
        )
        return out
    u = np.expm1(data.astype(np.float64) * np.log(log_base))
    return (np.log1p(u * scale[indices]) / np.log(log_base)).astype(np.float32)
