"""Build + ctypes bindings for the native rasterizer.

Compiles rasterize.cc once per environment into
~/.cache/tsnet_native/_rasterize.so (or $TSNET_NATIVE_DIR), keyed by a
source hash so edits rebuild automatically.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "rasterize.cc")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _cache_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    root = os.environ.get("TSNET_NATIVE_DIR",
                          os.path.expanduser("~/.cache/tsnet_native"))
    return os.path.join(root, f"_rasterize_{digest}.so")


def _build() -> Optional[str]:
    path = _cache_path()
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # per-process tmp name: concurrent builders (pytest workers, parallel
    # trainers) must not interleave writes into one file
    tmp = f"{path}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, path)
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None
    return path


def lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None (no toolchain / disabled)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("TSNET_NATIVE", "1") == "0":
            return None
        path = _build()
        if path is None:
            return None
        try:
            cdll = ctypes.CDLL(path)
        except OSError:
            # corrupt cached artifact: invalidate and fall back to numpy
            try:
                os.unlink(path)
            except OSError:
                pass
            return None
        cdll.tsnet_draw_edge.restype = ctypes.c_int
        cdll.tsnet_draw_edge.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int,
        ]
        cdll.tsnet_stamp_edge.restype = None
        cdll.tsnet_stamp_edge.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int,
        ]
        _LIB = cdll
        return _LIB


def available() -> bool:
    return lib() is not None


def native_draw_edge(img: np.ndarray, x, y, bw: int, color,
                     endpoints: bool) -> bool:
    """Fit + stamp one edge natively; returns False if unavailable.

    `img` must be C-contiguous uint8 (H, W) or (H, W, 3).
    """
    cdll = lib()
    if cdll is None:
        return False
    x = np.ascontiguousarray(x, np.float64)
    y = np.ascontiguousarray(y, np.float64)
    if x.size < 2:
        return True  # nothing to draw; matches numpy-tier None
    c = 1 if img.ndim == 2 else img.shape[2]
    # broadcast short colors over all channels (numpy-tier semantics:
    # img[yy, xx] = (255,) paints every channel); the C side reads c bytes
    col = np.asarray(color, np.uint8).reshape(-1)
    if col.size < c:
        col = np.broadcast_to(col[:1], (c,))
    col = np.ascontiguousarray(col[:c])
    cdll.tsnet_draw_edge(
        img.ctypes.data, img.shape[0], img.shape[1], c,
        x.ctypes.data, y.ctypes.data, x.size, int(bw),
        col.ctypes.data, int(endpoints))
    return True
