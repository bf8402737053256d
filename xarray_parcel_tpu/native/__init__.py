"""ctypes bindings for the native C++ ingest runtime (ingest.cc).

Builds the shared library on first use (g++, cached next to the source);
every entry point has a NumPy fallback so the package works unbuilt.  Use
``native.available()`` to check which path is active.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'ingest.cc')
_SO = os.path.join(_DIR, '_ingest.so')
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', '-pthread',
           _SRC, '-o', _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO) or
                    os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            i64, u8p = ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)
            f32p = ctypes.POINTER(ctypes.c_float)
            f64p = ctypes.POINTER(ctypes.c_double)
            lib.xpt_validate_columns_f32.argtypes = [f32p, i64, i64, u8p]
            lib.xpt_validate_columns_f64.argtypes = [f64p, i64, i64, u8p]
            lib.xpt_repack_f64_to_f32.argtypes = [f64p, f32p, i64]
            lib.xpt_levels_to_last_f32.argtypes = [f32p, f32p, i64, i64]
            lib.xpt_levels_to_last_f64_to_f32.argtypes = [f64p, f32p, i64,
                                                          i64]
            lib.xpt_compact_left_f32.argtypes = [
                f32p, ctypes.POINTER(f32p), i64, i64, i64]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available():
    """True when the compiled native library is in use."""
    return _load() is not None


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def validate_columns(pressure):
    """Per-column validity of the reference's input invariant: pressure
    strictly decreasing along the trailing axis, NaN padding only at the top
    (reference: modules/parcel_functions.py:2308-2321).  Returns a boolean
    array over the batch dims."""
    p = np.ascontiguousarray(pressure)
    batch = p.shape[:-1]
    L = p.shape[-1]
    flat = p.reshape(-1, L)
    lib = _load()
    if lib is not None and p.dtype in (np.float32, np.float64):
        ok = np.empty(flat.shape[0], np.uint8)
        if p.dtype == np.float32:
            lib.xpt_validate_columns_f32(_ptr(flat, ctypes.c_float),
                                         flat.shape[0], L,
                                         _ptr(ok, ctypes.c_uint8))
        else:
            lib.xpt_validate_columns_f64(_ptr(flat, ctypes.c_double),
                                         flat.shape[0], L,
                                         _ptr(ok, ctypes.c_uint8))
        return ok.astype(bool).reshape(batch)
    # NumPy fallback.
    d = np.diff(flat, axis=-1)
    nan_next = np.isnan(flat[:, 1:])
    decreasing = np.where(nan_next | np.isnan(flat[:, :-1]), True, d < 0)
    # non-NaN after NaN is malformed
    resurrect = (~nan_next) & np.isnan(flat[:, :-1])
    return (decreasing.all(-1) & ~resurrect.any(-1)).reshape(batch)


def repack_to_f32(arr):
    """float64 -> float32 conversion through the native path."""
    a = np.ascontiguousarray(arr)
    if a.dtype == np.float32:
        return a
    lib = _load()
    if lib is None or a.dtype != np.float64:
        return a.astype(np.float32)
    out = np.empty(a.shape, np.float32)
    lib.xpt_repack_f64_to_f32(_ptr(a, ctypes.c_double),
                              _ptr(out, ctypes.c_float), a.size)
    return out


def levels_to_last(arr):
    """Move a leading level axis to the trailing position, (L, …) -> (…, L),
    converting to float32 — the xarray ingest repack."""
    a = np.ascontiguousarray(arr)
    L = a.shape[0]
    batch = a.shape[1:]
    flat = a.reshape(L, -1)
    lib = _load()
    if lib is not None and a.dtype in (np.float32, np.float64):
        out = np.empty((flat.shape[1], L), np.float32)
        if a.dtype == np.float32:
            lib.xpt_levels_to_last_f32(_ptr(flat, ctypes.c_float),
                                       _ptr(out, ctypes.c_float), L,
                                       flat.shape[1])
        else:
            lib.xpt_levels_to_last_f64_to_f32(_ptr(flat, ctypes.c_double),
                                              _ptr(out, ctypes.c_float), L,
                                              flat.shape[1])
        return out.reshape(batch + (L,))
    return np.moveaxis(a, 0, -1).astype(np.float32)


def compact_left(fields, key):
    """Host-side left-compaction of leading NaNs (in the ``key`` field's NaN
    pattern) across a dict of (…, L) float arrays.  Dtype-preserving:
    float32 arrays ride the C++ kernel, other float dtypes take an
    equivalent NumPy path in their own precision (non-float inputs are cast
    to float32 so the NaN fill is representable).  Returns new arrays.
    Device-side equivalent: ops.compact_left."""
    def _as_float(v):
        a = np.ascontiguousarray(v)
        return a if np.issubdtype(a.dtype, np.floating) else \
            a.astype(np.float32)

    key_arr = _as_float(fields[key])
    L = key_arr.shape[-1]
    out = {k: _as_float(v).copy() for k, v in fields.items()}
    lib = _load()
    f32 = {k: v for k, v in out.items() if v.dtype == np.float32}
    if lib is not None and f32 and key_arr.dtype == np.float32:
        n_cols = key_arr.size // L
        arrs = list(f32.values())
        ptrs = (ctypes.POINTER(ctypes.c_float) * len(arrs))(
            *[_ptr(a, ctypes.c_float) for a in arrs])
        lib.xpt_compact_left_f32(_ptr(key_arr, ctypes.c_float), ptrs,
                                 len(arrs), n_cols, L)
        rest = {k: v for k, v in out.items() if v.dtype != np.float32}
    else:
        rest = out
    # NumPy path (fallback, and any non-f32 float arrays — dtype-preserving).
    flatk = key_arr.reshape(-1, L)
    lead = np.argmax(~np.isnan(flatk), axis=-1)
    lead = np.where(np.isnan(flatk).all(-1), 0, lead)
    idx = lead[:, None] + np.arange(L)[None, :]
    valid = idx < L
    idx = np.minimum(idx, L - 1)
    for k, v in rest.items():
        flat = v.reshape(-1, L)
        shifted = np.take_along_axis(flat, idx, axis=-1)
        shifted[~valid] = np.nan
        out[k] = shifted.reshape(v.shape)
    return out
