"""ctypes binding for the native C++ decode library (decoder.cpp).

Compiles on first use (g++, links libpng/libjpeg); silently unavailable if
the toolchain or libraries are missing — callers fall back to cv2.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), '_native')
_SO_PATH = os.path.join(_NATIVE_DIR, 'libbsvd_decode.so')
_SRC_PATH = os.path.join(_NATIVE_DIR, 'decoder.cpp')

_lock = threading.Lock()
_lib = None
_loader = None
_failed = False


def _build():
    cmd = ['g++', '-O3', '-shared', '-fPIC', _SRC_PATH, '-o', _SO_PATH,
           '-lpng', '-ljpeg', '-pthread']
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if (not os.path.exists(_SO_PATH)
                    or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)):
                _build()
            lib = ctypes.CDLL(_SO_PATH)
            lib.bsvd_loader_create.restype = ctypes.c_void_p
            lib.bsvd_loader_create.argtypes = [ctypes.c_int]
            lib.bsvd_loader_destroy.argtypes = [ctypes.c_void_p]
            lib.bsvd_decode_file.restype = ctypes.c_int
            lib.bsvd_decode_file.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.bsvd_free.argtypes = [ctypes.c_void_p]
            lib.bsvd_load_crop_seq.restype = ctypes.c_int
            lib.bsvd_load_crop_seq.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_void_p]
            lib.bsvd_image_dims.restype = ctypes.c_int
            lib.bsvd_image_dims.argtypes = [ctypes.c_char_p,
                                            ctypes.POINTER(ctypes.c_int),
                                            ctypes.POINTER(ctypes.c_int)]
            _lib = lib
        except Exception:
            _failed = True
            _lib = None
        return _lib


def available():
    return get_lib() is not None


def _get_loader():
    global _loader
    lib = get_lib()
    if lib is None:
        return None
    if _loader is None:
        n = int(os.environ.get('BSVD_DECODE_THREADS', 0)) or (os.cpu_count() or 4)
        _loader = lib.bsvd_loader_create(n)
    return _loader


def decode_image(path):
    """Decode a PNG/JPEG file -> (H, W, 3) uint8 RGB, or None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.c_void_p()
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.bsvd_decode_file(path.encode(), ctypes.byref(out),
                              ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        return None
    try:
        buf = ctypes.cast(out, ctypes.POINTER(
            ctypes.c_ubyte * (h.value * w.value * 3)))
        arr = np.frombuffer(buf.contents, dtype=np.uint8).reshape(
            h.value, w.value, 3).copy()
    finally:
        lib.bsvd_free(out)
    return arr


def image_dims(path):
    lib = get_lib()
    if lib is None:
        return None
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.bsvd_image_dims(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def load_crop_seq(paths, y0=-1, x0=-1, crop_h=None, crop_w=None):
    """Parallel decode + crop of a frame sequence.

    Args:
        paths: list of image file paths (one clip, temporal order).
        y0/x0: crop origin (-1 = no crop; then all frames must be
            (crop_h, crop_w) already — pass their true size).
    Returns:
        (T, crop_h, crop_w, 3) uint8 RGB, or None on failure.
    """
    lib = get_lib()
    if lib is None:
        return None
    if crop_h is None or crop_w is None:
        dims = image_dims(paths[0])
        if dims is None:
            return None
        crop_h, crop_w = dims
    t = len(paths)
    out = np.empty((t, crop_h, crop_w, 3), np.uint8)
    c_paths = (ctypes.c_char_p * t)(*[p.encode() for p in paths])
    rc = lib.bsvd_load_crop_seq(
        c_paths, t, y0, x0, crop_h, crop_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), _get_loader())
    if rc != 0:
        return None
    return out
