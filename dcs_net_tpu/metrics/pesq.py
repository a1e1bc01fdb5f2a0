"""Python binding for the native PESQ module (native/pesq/pesq.cc).

ctypes binding (no pybind11 in this image). The shared library is built on
first use with g++ and cached under build/; set DCSNET_PESQ_SO to point at a
prebuilt library. If the real `pypesq`/`pesq` wheels are importable they are
preferred for bit-exactness with the reference
(/root/reference/network_functions.py:6-9).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_external = None  # pypesq/pesq wheel, if present


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _find_external():
    global _external
    if _external is not None:
        return _external
    try:
        from pypesq import pesq as _p  # type: ignore

        _external = ("pypesq", _p)
    except ImportError:
        try:
            from pesq import pesq as _p  # type: ignore

            _external = ("pesq", _p)
        except ImportError:
            _external = ("", None)
    return _external


def is_estimate() -> bool:
    """True when PESQ values come from the native ESTIMATOR rather than a
    conformance-tested P.862 implementation.

    Finding (VERDICT r2 task 5, docs/PESQ_PARITY.md): this environment has no
    pypesq/pesq wheel and no network egress, and ITU P.862 reference scores /
    conformance pairs are not redistributable, so |MOS - P.862| cannot be
    bounded here. Metric keys therefore report 'pesq_est' unless a real wheel
    is importable."""
    name, fn = _find_external()
    return fn is None


def _build_library() -> str:
    root = _repo_root()
    src = os.path.join(root, "native", "pesq", "pesq.cc")
    build_dir = os.path.join(root, "build")
    os.makedirs(build_dir, exist_ok=True)
    so = os.path.join(build_dir, "libpesq.so")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", so, src],
            check=True, capture_output=True)
    return so


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            so = os.environ.get("DCSNET_PESQ_SO") or _build_library()
            lib = ctypes.CDLL(so)
            lib.pesq_mos.restype = ctypes.c_double
            lib.pesq_mos.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
            _lib = lib
    return _lib


def pesq(clean: np.ndarray, degraded: np.ndarray, sr: int = 16000) -> float:
    """Raw P.862-style MOS; call signature mirrors pypesq.pesq(ref, deg, fs)."""
    name, ext = _find_external()
    if ext is not None:
        if name == "pypesq":
            return float(ext(clean, degraded, sr))
        return float(ext(sr, np.asarray(clean), np.asarray(degraded), "wb"))
    lib = _load()
    c = np.ascontiguousarray(np.asarray(clean).ravel(), dtype=np.float32)
    d = np.ascontiguousarray(np.asarray(degraded).ravel(), dtype=np.float32)
    return float(lib.pesq_mos(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(c),
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(d),
        int(sr)))
