"""ctypes bindings for the native graph-build kernels (csrc/gcn_build.cpp).

Accelerates the host-side hot loops of ``data/graph.py`` at >=10M-edge scale
(measured at 87.4M edges on the 1-core build host: tile selection 65 s -> ~8 s,
transpose sort 24.6 s -> ~4 s, normalization 10.5 s -> ~2 s). Same posture as
the reference's native data layer (src/common/parser.cpp): the runtime around
the TPU compute path is C++ where it is hot. Pure-numpy fallbacks remain the
oracle (bit-exact equality is tested in tests/test_native.py).

Big outputs are wrapped WITHOUT copying: numpy views over the malloc'd buffers
with a finalizer calling ``gcn_build_free`` — the tile array alone is ~11 GB at
4x-reddit scale.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import weakref

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libgcn_build.so")
_lib: "ctypes.CDLL | None" = None
_tried = False

_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_int64)
_f32p = ctypes.POINTER(ctypes.c_float)
_u8p = ctypes.POINTER(ctypes.c_uint8)


def _build() -> bool:
    src = os.path.join(_CSRC, "gcn_build.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> "ctypes.CDLL | None":
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.gcn_norm_coef.argtypes = [_i64p, _i64p, ctypes.c_int64,
                                  ctypes.POINTER(_f32p)]
    lib.gcn_norm_coef.restype = ctypes.c_int
    lib.gcn_transpose_coo.argtypes = [
        _i64p, _i64p, _f32p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(_i64p), ctypes.POINTER(_i64p), ctypes.POINTER(_f32p)]
    lib.gcn_transpose_coo.restype = ctypes.c_int
    lib.gcn_select_tiles.argtypes = [
        _i64p, _i64p, _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(_i32p),
        ctypes.POINTER(_i32p), ctypes.POINTER(_u8p),
        ctypes.POINTER(ctypes.c_int64)]
    lib.gcn_select_tiles.restype = ctypes.c_int
    lib.gcn_build_free.argtypes = [ctypes.c_void_p]
    lib.gcn_build_free.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _wrap(lib, ptr, shape, dtype):
    """Zero-copy numpy view over a malloc'd buffer; frees it on GC."""
    n = int(np.prod(shape)) if shape else 0
    if n == 0:
        lib.gcn_build_free(ptr)
        return np.empty(shape, dtype=dtype)
    raw = ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint8 * (n * dtype.itemsize)))
    arr = np.frombuffer(raw.contents, dtype=dtype).reshape(shape)
    addr = ctypes.cast(ptr, ctypes.c_void_p).value
    weakref.finalize(arr, lib.gcn_build_free, addr)
    return arr


def _c64(a: np.ndarray):
    a = np.ascontiguousarray(a, dtype=np.int64)
    return a, a.ctypes.data_as(_i64p)


def _cf32(a: np.ndarray):
    a = np.ascontiguousarray(a, dtype=np.float32)
    return a, a.ctypes.data_as(_f32p)


def norm_coef(indptr: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Native normalization_coefficients (bit-exact: double math, one f32 round)."""
    lib = _load()
    assert lib is not None
    n = len(indptr) - 1
    _ip, ip = _c64(indptr)
    _ix, ix = _c64(indices)
    out = _f32p()
    rc = lib.gcn_norm_coef(ip, ix, n, ctypes.byref(out))
    if rc != 0:
        raise MemoryError("gcn_norm_coef failed")
    return _wrap(lib, out, (int(indptr[-1]),), np.dtype(np.float32))


def transpose_coo(src: np.ndarray, dst: np.ndarray, coef: np.ndarray, n: int):
    """Native stable counting sort by dst; returns (t_src, t_dst, t_coef)."""
    lib = _load()
    assert lib is not None
    _s, s = _c64(src)
    _d, d = _c64(dst)
    _w, w = _cf32(coef)
    ts, td, tc = _i64p(), _i64p(), _f32p()
    rc = lib.gcn_transpose_coo(s, d, w, len(src), n, ctypes.byref(ts),
                               ctypes.byref(td), ctypes.byref(tc))
    if rc != 0:
        raise MemoryError("gcn_transpose_coo failed")
    m = (len(src),)
    return (_wrap(lib, ts, m, np.dtype(np.int64)),
            _wrap(lib, td, m, np.dtype(np.int64)),
            _wrap(lib, tc, m, np.dtype(np.float32)))


def select_tiles(src: np.ndarray, dst: np.ndarray, coef: np.ndarray, n: int,
                 tb: int, min_edges: int, max_tiles: int, dtype: np.dtype,
                 unique_edges: bool):
    """Native _select_bsr_tiles core. Returns ((tiles, rows, cols, tb, T), keep)
    or None when this dtype/uniqueness combination is unsupported natively
    (bf16 with duplicate edges — the caller falls back to numpy)."""
    lib = _load()
    assert lib is not None
    as_bf16 = dtype.itemsize == 2
    if as_bf16 and not unique_edges:
        return None
    _s, s = _c64(src)
    _d, d = _c64(dst)
    _w, w = _cf32(coef)
    tiles_p = ctypes.c_void_p()
    rows_p, cols_p, keep_p = _i32p(), _i32p(), _u8p()
    k = ctypes.c_int64()
    rc = lib.gcn_select_tiles(
        s, d, w, len(src), n, tb, min_edges, max_tiles,
        1 if as_bf16 else 0, 1 if unique_edges else 0,
        ctypes.byref(tiles_p), ctypes.byref(rows_p), ctypes.byref(cols_p),
        ctypes.byref(keep_p), ctypes.byref(k))
    if rc != 0:
        raise MemoryError(f"gcn_select_tiles failed (rc={rc})")
    k = int(k.value)
    t_blocks = -(-n // tb)
    tiles = _wrap(lib, tiles_p, (k, tb, tb), np.dtype(dtype))
    rows = _wrap(lib, rows_p, (k,), np.dtype(np.int32))
    cols = _wrap(lib, cols_p, (k,), np.dtype(np.int32))
    keep = _wrap(lib, keep_p, (len(src),), np.dtype(np.uint8)).astype(bool)
    return (tiles, rows, cols, tb, t_blocks), keep
