"""3D TIFF I/O: native C++ codec with PIL fallback.

The hot path — whole uint16 microscopy stacks (the reference reads/writes
900^3 volumes via skimage/tifffile: singlevolume_dataset.py:33,
test_dice.py:151) — goes through the baseline-TIFF C++ codec
(native/tiffcodec.cpp, built by scripts/build_native.sh): O(1) page parsing
+ bulk fread/fwrite instead of PIL's per-page Python decode.  Compressed /
exotic TIFFs and non-TIFF formats fall back to PIL; .npy is supported
directly (the reference's make_dataset lists .npy files).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np
from PIL import Image, ImageSequence

Image.MAX_IMAGE_PIXELS = None  # large microscopy slices

_NATIVE = None


def _native():
    global _NATIVE
    if _NATIVE is None:
        so = os.path.join(os.path.dirname(__file__), "..", "native",
                          "libtiffcodec.so")
        try:
            lib = ctypes.CDLL(os.path.abspath(so))
            lib.tiff_probe.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int64),
                                       ctypes.POINTER(ctypes.c_int32)]
            lib.tiff_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
            try:
                lib.tiff_read_pages.argtypes = [
                    ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_void_p]
            except AttributeError:  # older .so without the paged API
                pass
            lib.tiff_write.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                       ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_int32,
                                       ctypes.c_int32]
            _NATIVE = lib
        except OSError:
            _NATIVE = False
    return _NATIVE or None


def imread(path: str) -> np.ndarray:
    """Load a 2D image or 3D (Z,Y,X) stack."""
    if path.endswith(".npy"):
        return np.load(path)
    lib = _native()
    if lib is not None:
        shape = (ctypes.c_int64 * 3)()
        bits = ctypes.c_int32()
        if lib.tiff_probe(path.encode(), shape, ctypes.byref(bits)) == 0:
            dt = {8: np.uint8, 16: np.uint16, 32: np.float32}[bits.value]
            out = np.empty((shape[0], shape[1], shape[2]), dt)
            if lib.tiff_read(path.encode(), out.ctypes.data_as(ctypes.c_void_p)) == 0:
                return out[0] if shape[0] == 1 else out
    with Image.open(path) as im:
        pages = [np.asarray(p) for p in ImageSequence.Iterator(im)]
    if len(pages) == 1:
        return pages[0]
    return np.stack(pages, axis=0)


def probe(path: str):
    """(shape, dtype) of a 3D stack WITHOUT reading pixel data, or None when
    the native codec can't parse it (caller falls back to a full imread)."""
    if path.endswith(".npy"):
        try:
            with open(path, "rb") as f:
                ver = np.lib.format.read_magic(f)
                shp, _, dt = np.lib.format._read_array_header(f, ver)
            return shp, dt
        except Exception:
            return None
    lib = _native()
    if lib is None or not hasattr(lib, "tiff_read_pages"):
        return None
    shape = (ctypes.c_int64 * 3)()
    bits = ctypes.c_int32()
    if lib.tiff_probe(path.encode(), shape, ctypes.byref(bits)) != 0:
        return None
    dt = {8: np.uint8, 16: np.uint16, 32: np.float32}[bits.value]
    return (shape[0], shape[1], shape[2]), np.dtype(dt)


def imread_pages(path: str, z0: int, z1: int) -> np.ndarray:
    """Read pages [z0, z1) of a 3D stack (native codec only — callers must
    probe() first; the streaming inference pipeline uses this to overlap
    TIFF decode with device upload)."""
    lib = _native()
    shape = (ctypes.c_int64 * 3)()
    bits = ctypes.c_int32()
    if (lib is None or not hasattr(lib, "tiff_read_pages")
            or lib.tiff_probe(path.encode(), shape, ctypes.byref(bits)) != 0):
        raise RuntimeError(f"paged read unsupported for {path}")
    dt = {8: np.uint8, 16: np.uint16, 32: np.float32}[bits.value]
    out = np.empty((z1 - z0, shape[1], shape[2]), dt)
    rc = lib.tiff_read_pages(path.encode(), z0, z1,
                             out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise RuntimeError(f"tiff_read_pages({path}, {z0}, {z1}) -> {rc}")
    return out


def imwrite(path: str, arr: np.ndarray) -> None:
    """Save a 2D image or a 3D (Z,Y,X) stack as (multi-page) TIFF."""
    arr = np.asarray(arr)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if path.endswith(".npy"):
        np.save(path, arr)
        return
    lib = _native()
    if lib is not None and arr.dtype in (np.uint8, np.uint16, np.float32):
        a3 = arr[None] if arr.ndim == 2 else arr
        a3 = np.ascontiguousarray(a3)
        bits = a3.dtype.itemsize * 8
        is_float = 1 if a3.dtype == np.float32 else 0
        total = a3.nbytes + a3.shape[0] * 200 + 64
        if a3.ndim == 3 and total < 0xFFFFFFF0:
            rc = lib.tiff_write(path.encode(),
                                a3.ctypes.data_as(ctypes.c_void_p),
                                a3.shape[0], a3.shape[1], a3.shape[2],
                                bits, is_float)
            if rc == 0:
                return
    if arr.ndim == 2:
        _page(arr).save(path)
        return
    pages = [_page(sl) for sl in arr]
    pages[0].save(path, save_all=True, append_images=pages[1:])


def _page(sl: np.ndarray) -> Image.Image:
    if sl.dtype == np.uint16:
        return Image.fromarray(sl, mode="I;16")
    if sl.dtype in (np.float32, np.float64):
        return Image.fromarray(sl.astype(np.float32), mode="F")
    return Image.fromarray(sl)
