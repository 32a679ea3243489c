"""ctypes bindings for the native host-runtime kernels (native/bpt_native.c).

Compiled on first use with the system toolchain into ``native/build/``;
all callers fall back to the pure-Python paths if the toolchain or the
library is unavailable, so the package works without native code (just
slower at the host <-> device boundary).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_HERE, "native", "bpt_native.c")
_BUILD_DIR = os.path.join(_HERE, "native", "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libbpt_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(
                _LIB_PATH
            ) < os.path.getmtime(_SRC):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                subprocess.run(
                    ["cc", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.mont_mul_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_size_t,
                ctypes.c_void_p,
                ctypes.c_uint64,
                ctypes.c_int,
            ]
            lib.keccak_f1600.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def mont_mul_batch(a_u64: np.ndarray, b_limbs: np.ndarray, modulus_limbs: np.ndarray, n0inv: int) -> np.ndarray:
    """a_u64: (n, nl) uint64; returns (n, nl) = montmul(a[i], b) elementwise."""
    lib = _load()
    assert lib is not None
    n, nl = a_u64.shape
    a_u64 = np.ascontiguousarray(a_u64, dtype=np.uint64)
    b = np.ascontiguousarray(b_limbs, dtype=np.uint64)
    m = np.ascontiguousarray(modulus_limbs, dtype=np.uint64)
    out = np.empty_like(a_u64)
    lib.mont_mul_batch(
        a_u64.ctypes.data,
        b.ctypes.data,
        out.ctypes.data,
        n,
        m.ctypes.data,
        ctypes.c_uint64(n0inv & 0xFFFFFFFFFFFFFFFF),
        nl,
    )
    return out


def keccak_f1600(state: bytearray) -> None:
    """In-place Keccak-f[1600] on a 200-byte state (native)."""
    lib = _load()
    assert lib is not None
    buf = (ctypes.c_uint8 * 200).from_buffer(state)
    lib.keccak_f1600(buf)
