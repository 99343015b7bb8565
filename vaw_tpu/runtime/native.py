"""ctypes bindings for the native batch-assembly library, with
compile-on-demand (g++ is in the image; pybind11 is not — the CPython
boundary is plain C ABI + ctypes).

Falls back to numpy transparently when compilation is impossible, so the
framework never hard-depends on a toolchain at runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

__all__ = ["get_lib", "gather_normalize", "normalize_u8", "native_available"]

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_SRC = os.path.join(os.path.dirname(__file__), "batch_ops.cpp")


def _build() -> Optional[str]:
    cache_dir = os.environ.get(
        "VAW_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "vaw_tpu_native"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "batch_ops.so")
    if (os.path.exists(so_path)
            and os.path.getmtime(so_path) >= os.path.getmtime(_SRC)):
        return so_path
    # Per-pid temp name: concurrent first-builds from multiple processes
    # (the 2-process integration tests, multi-host pods on shared /tmp)
    # would otherwise interleave writes into one .tmp and publish a
    # corrupt .so via os.replace.
    tmp = f"{so_path}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
        return so_path
    except Exception:  # noqa: BLE001 — fall back to numpy
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so_path = _build()
        if so_path is None:
            return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            # A corrupt cached .so (partial write from a crashed build)
            # must degrade to the numpy path, not kill training.
            return None
        lib.vaw_gather_normalize.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.vaw_normalize_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return get_lib() is not None


def gather_normalize(images: np.ndarray, idx: np.ndarray,
                     flips: Optional[np.ndarray] = None,
                     num_threads: int = 8) -> np.ndarray:
    """images [N,h,w,c] uint8, idx [B] -> [B,h,w,c] f32 in [-1,1], with
    optional per-row horizontal flip. One fused native pass; numpy fallback.
    """
    assert images.dtype == np.uint8 and images.flags.c_contiguous
    idx = np.ascontiguousarray(idx, np.int64)
    b = len(idx)
    _, h, w, c = images.shape
    lib = get_lib()
    if lib is None:
        out = images[idx]
        if flips is not None:
            out = np.where(
                flips.astype(bool)[:, None, None, None],
                out[:, :, ::-1], out,
            )
        return out.astype(np.float32) / 127.5 - 1.0
    out = np.empty((b, h, w, c), np.float32)
    flips_arr = (
        np.ascontiguousarray(flips, np.uint8) if flips is not None else None
    )
    lib.vaw_gather_normalize(
        images.ctypes.data, idx.ctypes.data,
        flips_arr.ctypes.data if flips_arr is not None else None,
        out.ctypes.data, b, h, w, c, num_threads,
    )
    return out


def normalize_u8(src: np.ndarray, num_threads: int = 8) -> np.ndarray:
    """uint8 array -> f32 in [-1,1] (native; numpy fallback)."""
    src = np.ascontiguousarray(src, np.uint8)
    lib = get_lib()
    if lib is None:
        return src.astype(np.float32) / 127.5 - 1.0
    out = np.empty(src.shape, np.float32)
    lib.vaw_normalize_u8(src.ctypes.data, out.ctypes.data, src.size,
                         num_threads)
    return out
