"""ctypes bindings for the native C++ dataset parser (csrc/gcn_parser.cpp).

The reference's data layer is native C++ (src/common/parser.cpp); ours is too —
this module loads ``libgcn_parser.so`` (auto-building it with g++ on first use
if absent) and wraps the returned malloc'd buffers as numpy arrays that free
their C memory on garbage collection. ``data/parser.py`` transparently prefers
this path and falls back to the pure-Python oracle when no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libgcn_parser.so")
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    src = os.path.join(_CSRC, "gcn_parser.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> ctypes.CDLL | None:
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
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.gcn_parse_graph.argtypes = [ctypes.c_char_p, ctypes.POINTER(i32p),
                                    ctypes.POINTER(i32p), i64p, i64p]
    lib.gcn_parse_graph.restype = ctypes.c_int
    lib.gcn_parse_svmlight.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(i32p), ctypes.POINTER(i32p),
        ctypes.POINTER(f32p), ctypes.POINTER(i32p), i64p, i64p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.gcn_parse_svmlight.restype = ctypes.c_int
    lib.gcn_parse_split.argtypes = [ctypes.c_char_p, ctypes.POINTER(i32p), i64p]
    lib.gcn_parse_split.restype = ctypes.c_int
    lib.gcn_free.argtypes = [ctypes.c_void_p]
    lib.gcn_free.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_array(lib, ptr, n, dtype):
    """Copy a malloc'd C buffer into a numpy array and free it immediately."""
    ctype = {np.int32: ctypes.c_int32, np.float32: ctypes.c_float}[dtype]
    if n == 0:
        lib.gcn_free(ptr)
        return np.empty(0, dtype=dtype)
    buf = ctypes.cast(ptr, ctypes.POINTER(ctype * n)).contents
    arr = np.frombuffer(buf, dtype=dtype, count=n).copy()
    lib.gcn_free(ptr)
    return arr


def load_dataset(paths: dict):
    """Parse the three files natively; returns a GCNDataset."""
    from cuda_gcn_tpu.data.parser import CSR, GCNDataset

    lib = _load()
    if lib is None:
        raise RuntimeError("native parser unavailable")

    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)

    g_indptr, g_indices = i32p(), i32p()
    n_nodes, g_nnz = ctypes.c_int64(), ctypes.c_int64()
    rc = lib.gcn_parse_graph(paths["graph"].encode(), ctypes.byref(g_indptr),
                             ctypes.byref(g_indices), ctypes.byref(n_nodes),
                             ctypes.byref(g_nnz))
    if rc != 0:
        raise RuntimeError(f"native graph parse failed (rc={rc})")

    f_indptr, f_indices, f_values, labels = i32p(), i32p(), f32p(), i32p()
    f_rows, f_nnz = ctypes.c_int64(), ctypes.c_int64()
    input_dim, output_dim = ctypes.c_int32(), ctypes.c_int32()
    rc = lib.gcn_parse_svmlight(paths["svmlight"].encode(), ctypes.byref(f_indptr),
                                ctypes.byref(f_indices), ctypes.byref(f_values),
                                ctypes.byref(labels), ctypes.byref(f_rows),
                                ctypes.byref(f_nnz), ctypes.byref(input_dim),
                                ctypes.byref(output_dim))
    if rc != 0:
        raise RuntimeError(f"native svmlight parse failed (rc={rc})")

    split_p = i32p()
    split_n = ctypes.c_int64()
    rc = lib.gcn_parse_split(paths["split"].encode(), ctypes.byref(split_p),
                             ctypes.byref(split_n))
    if rc != 0:
        raise RuntimeError(f"native split parse failed (rc={rc})")

    n = int(n_nodes.value)
    return GCNDataset(
        graph=CSR(indptr=_as_array(lib, g_indptr, n + 1, np.int32),
                  indices=_as_array(lib, g_indices, int(g_nnz.value), np.int32)),
        feature_index=CSR(indptr=_as_array(lib, f_indptr, int(f_rows.value) + 1, np.int32),
                          indices=_as_array(lib, f_indices, int(f_nnz.value), np.int32)),
        feature_value=_as_array(lib, f_values, int(f_nnz.value), np.float32),
        label=_as_array(lib, labels, int(f_rows.value), np.int32),
        split=_as_array(lib, split_p, int(split_n.value), np.int32),
        num_nodes=n,
        input_dim=int(input_dim.value),
        output_dim=int(output_dim.value),
    )


# --- native label propagation (csrc/gcn_lpa.cpp) ---------------------------

_LPA_LIB_PATH = os.path.join(_CSRC, "libgcn_lpa.so")
_lpa_lib: ctypes.CDLL | None = None
_lpa_tried = False


def _load_lpa() -> ctypes.CDLL | None:
    global _lpa_lib, _lpa_tried
    if _lpa_lib is not None or _lpa_tried:
        return _lpa_lib
    _lpa_tried = True
    src = os.path.join(_CSRC, "gcn_lpa.cpp")
    if not os.path.exists(_LPA_LIB_PATH):
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-fPIC", "-pthread", "-shared",
                 "-o", _LPA_LIB_PATH, src],
                check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(_LPA_LIB_PATH)
    except OSError:
        return None
    lib.gcn_lpa.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int32, ctypes.POINTER(ctypes.c_int64)]
    lib.gcn_lpa.restype = ctypes.c_int64
    _lpa_lib = lib
    return lib


def lpa_available() -> bool:
    return _load_lpa() is not None


def label_propagation(indptr: np.ndarray, indices: np.ndarray, rounds: int,
                      seed_labels: np.ndarray | None = None) -> np.ndarray:
    """Native synchronous LPA; exact same semantics as the numpy
    implementation in data/reorder.py (modal neighbor label, ties -> smallest,
    early fixpoint exit). Raises RuntimeError when the library is unavailable."""
    lib = _load_lpa()
    if lib is None:
        raise RuntimeError("native LPA unavailable")
    n = len(indptr) - 1
    indptr64 = np.ascontiguousarray(indptr, dtype=np.int64)
    indices32 = np.ascontiguousarray(indices, dtype=np.int32)
    labels = (np.arange(n, dtype=np.int64) if seed_labels is None
              else np.ascontiguousarray(seed_labels, dtype=np.int64).copy())
    rc = lib.gcn_lpa(
        indptr64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(n), ctypes.c_int32(rounds),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc < 0:
        raise RuntimeError(f"native LPA failed (rc={rc})")
    return labels
