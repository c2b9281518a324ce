"""ctypes bridge to the native C++ batch decoder (native/loader.cpp).

Builds ``libsnnloader.so`` on first use (g++ + libpng, cached next to the
source) and exposes :func:`decode_batch`. The pipeline uses it when
available and silently falls back to cv2 threads otherwise — behavior is
identical (RGB uint8), verified in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libsnnloader.so"
_lib = None
_unavailable = False


def _load():
    global _lib, _unavailable
    if _lib is not None or _unavailable:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.snn_decode_batch.restype = ctypes.c_int
        lib.snn_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.snn_png_shape.restype = ctypes.c_int
        lib.snn_png_shape.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
    except Exception:
        _unavailable = True
    return _lib


def available() -> bool:
    return _load() is not None


def png_shape(path: str) -> tuple[int, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.snn_png_shape(path.encode(), ctypes.byref(h), ctypes.byref(w)):
        raise FileNotFoundError(path)
    return h.value, w.value


def decode_batch(
    paths: list[str], height: int, width: int, n_threads: int = 4
) -> np.ndarray:
    """Decode PNGs into an (N, H, W, 3) RGB uint8 array (C++ thread pool)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, height, width, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.snn_decode_batch(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        height,
        width,
        3,
        n_threads,
    )
    if rc == -1:
        raise ValueError("bad decode arguments")
    if rc > 0:
        raise FileNotFoundError(f"failed to decode {paths[rc - 1]}")
    return out
