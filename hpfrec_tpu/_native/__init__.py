"""ctypes bindings for the native host-side data kernels.

Import-safe: if the toolchain is unavailable the import of the individual
functions raises and callers fall back to numpy/scipy paths
(see ``utils/data.py``).  ``get()`` mirrors the reference's
``_check_openmp.get()`` capability probe (``hpfrec/return{0,1}.pyx``,
``hpfrec/__init__.py:251-256``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_lib = None
_load_error: Exception | None = None


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        from .build import build_native

        path = build_native()
        lib = ctypes.CDLL(path)
        lib.has_openmp.restype = ctypes.c_int
        lib.factorize_i64.restype = ctypes.c_int64
        _lib = lib
    except Exception as e:  # toolchain missing, sandboxed, etc.
        _load_error = e
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def get() -> int:
    """1 if the native library was built with OpenMP, 0 otherwise
    (reference `_check_openmp.get()` parity)."""
    lib = _load()
    return int(lib.has_openmp()) if lib is not None else 0


def set_num_threads(n: int) -> None:
    lib = _load()
    if lib is not None:
        lib.set_num_threads(ctypes.c_int(n))


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def coo_to_csr(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray, nrows: int):
    """COO -> CSR (indptr int64, indices int32, data) via counting sort."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native unavailable: {_load_error}")
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    nnz = rows.shape[0]
    indptr = np.empty(nrows + 1, dtype=np.int64)
    out_cols = np.empty(nnz, dtype=np.int32)
    if vals.dtype == np.float64:
        vals = np.ascontiguousarray(vals, dtype=np.float64)
        out_vals = np.empty(nnz, dtype=np.float64)
        fn = lib.coo_to_csr_f64
        vt = ctypes.c_double
    else:
        vals = np.ascontiguousarray(vals, dtype=np.float32)
        out_vals = np.empty(nnz, dtype=np.float32)
        fn = lib.coo_to_csr_f32
        vt = ctypes.c_float
    fn(_ptr(rows, ctypes.c_int32), _ptr(cols, ctypes.c_int32), _ptr(vals, vt),
       ctypes.c_int64(nnz), ctypes.c_int64(nrows),
       _ptr(indptr, ctypes.c_int64), _ptr(out_cols, ctypes.c_int32),
       _ptr(out_vals, vt))
    return indptr, out_cols, out_vals


def gather_rows(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
                rows: np.ndarray):
    """Concatenate CSR slices of ``rows``: returns (vals, row_ids, col_ids)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native unavailable: {_load_error}")
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    nbatch = rows.shape[0]
    out_starts = np.empty(nbatch + 1, dtype=np.int64)
    lib.gather_starts(_ptr(indptr, ctypes.c_int64), _ptr(rows, ctypes.c_int64),
                      ctypes.c_int64(nbatch), _ptr(out_starts, ctypes.c_int64))
    total = int(out_starts[-1])
    out_rows = np.empty(total, dtype=np.int32)
    out_cols = np.empty(total, dtype=np.int32)
    if data.dtype == np.float64:
        data = np.ascontiguousarray(data, dtype=np.float64)
        out_vals = np.empty(total, dtype=np.float64)
        fn = lib.gather_rows_f64
        vt = ctypes.c_double
    else:
        data = np.ascontiguousarray(data, dtype=np.float32)
        out_vals = np.empty(total, dtype=np.float32)
        fn = lib.gather_rows_f32
        vt = ctypes.c_float
    fn(_ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32), _ptr(data, vt),
       _ptr(rows, ctypes.c_int64), ctypes.c_int64(nbatch),
       _ptr(out_starts, ctypes.c_int64), _ptr(out_rows, ctypes.c_int32),
       _ptr(out_cols, ctypes.c_int32), _ptr(out_vals, vt))
    return out_vals, out_rows, out_cols


def ell_fill(seg_start: np.ndarray, seg_len: np.ndarray, indices: np.ndarray,
             data: np.ndarray, out_cols: np.ndarray, out_vals: np.ndarray):
    """Fill one pre-zeroed (m, w) ELL bucket from CSR segments in parallel."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native unavailable: {_load_error}")
    seg_start = np.ascontiguousarray(seg_start, dtype=np.int64)
    seg_len = np.ascontiguousarray(seg_len, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    nseg, w = out_cols.shape
    if not (out_cols.flags.c_contiguous and out_vals.flags.c_contiguous):
        raise TypeError("ell_fill: output buffers must be C-contiguous")
    if data.dtype == np.float64:
        fn, vt = lib.ell_fill_f64, ctypes.c_double
    else:
        fn, vt = lib.ell_fill_f32, ctypes.c_float
    data = np.ascontiguousarray(data)
    fn(_ptr(seg_start, ctypes.c_int64), _ptr(seg_len, ctypes.c_int64),
       _ptr(indices, ctypes.c_int32), _ptr(data, vt),
       ctypes.c_int64(nseg), ctypes.c_int64(w),
       _ptr(out_cols, ctypes.c_int32), _ptr(out_vals, vt))


def sort_csr_cols(indptr: np.ndarray, indices: np.ndarray,
                  data: np.ndarray) -> None:
    """IN-PLACE stable per-row sort of CSR (indices, data) by column id.

    ``indices`` must be contiguous int32 and ``data`` contiguous f32/f64;
    callers own the copy-before-mutate decision.  Parallel over rows;
    already-sorted rows are detected and skipped, so calling on sorted
    input is O(nnz) scan only.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native unavailable: {_load_error}")
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    # explicit checks (not assert): under ``python -O`` asserts are
    # stripped and a wrong-dtype/non-contiguous array would hand garbage
    # pointers to the in-place native kernel (silent memory corruption)
    if indices.dtype != np.int32 or not indices.flags.c_contiguous:
        raise TypeError("sort_csr_cols: 'indices' must be contiguous int32")
    if not data.flags.c_contiguous or indices.shape != data.shape:
        raise TypeError("sort_csr_cols: 'data' must be contiguous and match "
                        "'indices' in shape")
    nrows = indptr.shape[0] - 1
    if data.dtype == np.float64:
        fn, vt = lib.sort_csr_cols_f64, ctypes.c_double
    elif data.dtype == np.float32:
        fn, vt = lib.sort_csr_cols_f32, ctypes.c_float
    else:
        raise TypeError("sort_csr_cols: 'data' must be float32 or float64")
    fn(_ptr(indptr, ctypes.c_int64), ctypes.c_int64(nrows),
       _ptr(indices, ctypes.c_int32), _ptr(data, vt))


def factorize_i64(ids: np.ndarray):
    """First-occurrence-order integer factorize (pd.factorize semantics)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native unavailable: {_load_error}")
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    n = ids.shape[0]
    codes = np.empty(n, dtype=np.int32)
    uniques = np.empty(n, dtype=np.int64)
    nuniq = int(lib.factorize_i64(_ptr(ids, ctypes.c_int64), ctypes.c_int64(n),
                                  _ptr(codes, ctypes.c_int32),
                                  _ptr(uniques, ctypes.c_int64)))
    return codes, uniques[:nuniq].copy()
