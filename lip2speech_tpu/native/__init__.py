"""Native (C) host-runtime components.

The TPU compute path is JAX/XLA; the host data-loader's hot op — JPEG
decode of the bz2-pickled frame stacks every corpus uses — has a native
libjpeg implementation here. ctypes calls release the GIL, so the
threaded Loader decodes clips in true parallel. Built on first import
(gcc, ~1 s); falls back to cv2 transparently if the toolchain or libjpeg
is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "_jpegstack.so")
_SRC = os.path.join(_DIR, "jpegstack.c")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["gcc", "-O3", "-shared", "-fPIC", _SRC, "-ljpeg", "-o", _SO],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib():
    """Load (building if needed) the native decoder; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.decode_jpeg_rgb.restype = ctypes.c_int
    lib.decode_jpeg_rgb.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.probe_jpeg.restype = ctypes.c_int
    lib.probe_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return _lib


def decode_jpeg_stack_native(buffers: list[bytes]) -> np.ndarray | None:
    """Decode a list of encoded JPEG frames -> (T, H, W, 3) RGB uint8.
    Returns None if the native path is unavailable or shapes disagree."""
    lib = get_lib()
    if lib is None or not buffers:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.probe_jpeg(buffers[0], len(buffers[0]), ctypes.byref(h), ctypes.byref(w)):
        return None
    out = np.empty((len(buffers), h.value, w.value, 3), np.uint8)
    for i, buf in enumerate(buffers):
        rc = lib.decode_jpeg_rgb(
            buf, len(buf), out[i].ctypes.data_as(ctypes.c_void_p), h.value, w.value
        )
        if rc != 0:
            return None
    return out
