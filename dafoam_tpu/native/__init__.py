"""Native (C++) host-side runtime pieces, loaded via ctypes.

The compute path is JAX/XLA/Pallas; these are the IO/runtime components
the reference implements natively (pyofm mesh reading,
/root/reference/dafoam/pyDAFoam.py:1858-1890). The shared library is
built on first use with g++ (cached next to the source, keyed on a
source hash) — no pybind11/pip needed. `DAFOAM_TPU_NO_NATIVE=1`
disables the whole path; every caller keeps a pure-numpy fallback.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ofparse.cpp")
_LIB = None
_LIB_TRIED = False


def _build_lib() -> str | None:
    with open(_SRC, "rb") as fh:
        tag = hashlib.sha256(fh.read()).hexdigest()[:12]
    so_path = os.path.join(_DIR, f"_ofparse_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    # build into a temp file then atomically rename (concurrent pytest
    # workers may race the first build)
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
        return so_path
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if os.environ.get("DAFOAM_TPU_NO_NATIVE") == "1":
        return None
    so = _build_lib()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    i64 = ctypes.c_int64
    pi64 = ctypes.POINTER(i64)
    pf64 = ctypes.POINTER(ctypes.c_double)
    lib.of_free.argtypes = [ctypes.c_void_p]
    lib.of_free.restype = None
    lib.of_parse_labels_ascii.argtypes = [
        ctypes.c_char_p, i64, ctypes.POINTER(pi64), pi64]
    lib.of_parse_labels_ascii.restype = ctypes.c_int
    lib.of_parse_points_ascii.argtypes = [
        ctypes.c_char_p, i64, ctypes.POINTER(pf64), pi64]
    lib.of_parse_points_ascii.restype = ctypes.c_int
    lib.of_parse_faces_ascii.argtypes = [
        ctypes.c_char_p, i64, ctypes.POINTER(pi64), pi64,
        ctypes.POINTER(pi64), pi64]
    lib.of_parse_faces_ascii.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _take_i64(lib, ptr, n) -> np.ndarray:
    try:
        return np.ctypeslib.as_array(ptr, shape=(int(n),)).astype(
            np.int64, copy=True)
    finally:
        lib.of_free(ptr)


def parse_labels_ascii(payload: bytes):
    """int64 label list from an ASCII "N ( ... )" payload, or None."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_int64)()
    n = ctypes.c_int64()
    rc = lib.of_parse_labels_ascii(payload, len(payload),
                                   ctypes.byref(out), ctypes.byref(n))
    if rc != 0:
        return None
    return _take_i64(lib, out, n.value)


def parse_points_ascii(payload: bytes):
    """(n,3) float64 point list from an ASCII payload, or None."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_double)()
    n = ctypes.c_int64()
    rc = lib.of_parse_points_ascii(payload, len(payload),
                                   ctypes.byref(out), ctypes.byref(n))
    if rc != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(out, shape=(int(n.value) * 3,)).astype(
            np.float64, copy=True)
    finally:
        lib.of_free(out)
    return arr.reshape(int(n.value), 3)


def parse_faces_ascii(payload: bytes):
    """(csr_index (n+1,), flat_verts) from ASCII faces, or None."""
    lib = _load()
    if lib is None:
        return None
    idx = ctypes.POINTER(ctypes.c_int64)()
    flat = ctypes.POINTER(ctypes.c_int64)()
    nidx = ctypes.c_int64()
    nflat = ctypes.c_int64()
    rc = lib.of_parse_faces_ascii(payload, len(payload),
                                  ctypes.byref(idx), ctypes.byref(nidx),
                                  ctypes.byref(flat), ctypes.byref(nflat))
    if rc != 0:
        return None
    return (_take_i64(lib, idx, nidx.value),
            _take_i64(lib, flat, nflat.value))
