"""ctypes binding for the native audio front-end (native/audio/audioio.cc).

Drop-in accelerator for the Python loader: `fill_batch` decodes + resamples +
crops a whole training batch in one C call with pthread parallelism, writing
directly into the numpy output buffers. `VoiceBankDataset`/`Loader` use it
automatically when the library builds (`native_available()`); the pure-Python
path remains the fallback and the semantics oracle (tests compare the two).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

from dcs_net_tpu.data.audio_io import sinc_resample_kernel

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        root = _repo_root()
        src = os.path.join(root, "native", "audio", "audioio.cc")
        build = os.path.join(root, "build")
        so = os.environ.get("DCSNET_AUDIOIO_SO") or os.path.join(
            build, "libaudioio.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                os.makedirs(build, exist_ok=True)
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-pthread", "-o", so, src],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so)
        except Exception:
            _build_failed = True
            return None
        c_float_p = ctypes.POINTER(ctypes.c_float)
        lib.audioio_load.restype = ctypes.c_int64
        lib.audioio_load.argtypes = [
            ctypes.c_char_p, ctypes.c_int, c_float_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, c_float_p,
            ctypes.c_int64]
        lib.audioio_fill_batch.restype = ctypes.c_int
        lib.audioio_fill_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int64,
            ctypes.c_int, c_float_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, c_float_p, c_float_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _kernel_args(orig_freq: int, new_freq: int):
    if orig_freq == new_freq:
        return None, 0, 0, 0, 1
    kernels, width, orig, new = sinc_resample_kernel(orig_freq, new_freq)
    k = np.ascontiguousarray(kernels, np.float32)
    return k, new, k.shape[1], width, orig


def load_wav(path: str, normalize: bool = True,
             orig_freq: int = 0, new_freq: int = 0) -> np.ndarray:
    """Decode (and optionally resample) one wav natively."""
    lib = _load()
    assert lib is not None, "native audioio unavailable"
    k, n_phases, klen, width, orig = (
        _kernel_args(orig_freq, new_freq) if orig_freq else (None, 0, 0, 0, 1))
    kp = k.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if k is not None else None
    n = lib.audioio_load(path.encode(), int(normalize), kp, n_phases, klen,
                         width, orig, None, 0)
    if n < 0:
        raise IOError(f"native wav decode failed: {path}")
    out = np.empty(n, np.float32)
    lib.audioio_load(path.encode(), int(normalize), kp, n_phases, klen, width,
                     orig, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    return out


def fill_batch(
    clean_paths: Sequence[str],
    noisy_paths: Sequence[str],
    starts: Sequence[int],
    crop: int,
    *,
    normalize: bool = True,
    orig_freq: int = 48000,
    new_freq: int = 16000,
    n_threads: int = 2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode/resample/crop a whole batch in one native call."""
    lib = _load()
    assert lib is not None, "native audioio unavailable"
    b = len(clean_paths)
    k, n_phases, klen, width, orig = _kernel_args(orig_freq, new_freq)
    kp = k.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if k is not None else None
    clean = np.empty((b, crop), np.float32)
    noisy = np.empty((b, crop), np.float32)
    c_paths = (ctypes.c_char_p * b)(*[p.encode() for p in clean_paths])
    n_paths = (ctypes.c_char_p * b)(*[p.encode() for p in noisy_paths])
    st = np.asarray(starts, np.int64)
    rc = lib.audioio_fill_batch(
        c_paths, n_paths, st.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b, crop, int(normalize), kp, n_phases, klen, width, orig, n_threads,
        clean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        noisy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        i = -rc - 1
        raise IOError(f"native batch fill failed on item {i}: "
                      f"{clean_paths[i]} / {noisy_paths[i]}")
    return clean, noisy
