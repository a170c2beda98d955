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


class StreamingTiffWriter:
    """Incremental multi-page TIFF writer.

    Produces byte-identical output to the native codec's ``tiff_write``
    (layout: header | page0 | ifd0 | page1 | ifd1 | ...; all offsets are a
    pure function of the declared shape), but accepts the pages in ordered
    chunks, so the streaming inference pipeline can encode the output volume
    WHILE later slabs are still in device-to-host flight — the reference
    writes the whole assembled volume only after the fact
    (/root/reference/test_dice.py:151-166).

    Total file size must fit classic TIFF (< 4 GB): callers check
    ``StreamingTiffWriter.fits(shape, dtype)`` and fall back to ``imwrite``.
    """

    _IFD_ENTRIES = 10
    _IFD_SIZE = 2 + _IFD_ENTRIES * 12 + 4

    def __init__(self, path: str, shape, dtype):
        z, h, w = (int(s) for s in shape)
        dtype = np.dtype(dtype)
        if dtype not in (np.uint8, np.uint16, np.float32):
            raise ValueError(f"unsupported dtype {dtype}")
        if not self.fits(shape, dtype):
            raise ValueError("volume exceeds the classic-TIFF 4 GB limit")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.shape, self.dtype, self.path = (z, h, w), dtype, path
        self._page_bytes = h * w * dtype.itemsize
        self._z_written = 0
        self._f = open(path, "wb")
        first_ifd = 8 + self._page_bytes  # header | page0 | ifd0
        self._f.write(np.array([0x4949, 42], "<u2").tobytes()
                      + np.array([first_ifd], "<u4").tobytes())

    @classmethod
    def fits(cls, shape, dtype) -> bool:
        z, h, w = (int(s) for s in shape)
        total = 8 + z * (h * w * np.dtype(dtype).itemsize + cls._IFD_SIZE)
        return total < 0xFFFFFFF0

    def _ifd(self, i: int) -> bytes:
        z, h, w = self.shape
        bits = self.dtype.itemsize * 8
        data_off = 8 + i * (self._page_bytes + self._IFD_SIZE)
        next_off = (data_off + 2 * self._page_bytes + self._IFD_SIZE
                    if i + 1 < z else 0)
        sample_fmt = 3 if self.dtype == np.float32 else 1
        # (tag, type, count, value) rows — tag order matches tiff_write
        rows = [(256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, bits),
                (259, 3, 1, 1), (262, 3, 1, 1), (273, 4, 1, data_off),
                (277, 3, 1, 1), (278, 4, 1, h),
                (279, 4, 1, self._page_bytes), (339, 3, 1, sample_fmt)]
        out = [np.array([self._IFD_ENTRIES], "<u2").tobytes()]
        for tag, typ, count, value in rows:
            out.append(np.array([tag, typ], "<u2").tobytes()
                       + np.array([count, value], "<u4").tobytes())
        out.append(np.array([next_off], "<u4").tobytes())
        return b"".join(out)

    def write_rows(self, rows: np.ndarray) -> None:
        """Append one or more complete pages (rows.shape = (n, H, W))."""
        rows = np.ascontiguousarray(rows, self.dtype)
        if rows.ndim == 2:
            rows = rows[None]
        z, h, w = self.shape
        if rows.shape[1:] != (h, w):
            raise ValueError(f"page shape {rows.shape[1:]} != {(h, w)}")
        if self._z_written + rows.shape[0] > z:
            raise ValueError("more pages than declared")
        for page in rows:
            self._f.write(page.tobytes())
            self._f.write(self._ifd(self._z_written))
            self._z_written += 1

    def close(self) -> None:
        if self._f is not None:
            f, self._f = self._f, None
            f.close()
            if self._z_written != self.shape[0]:
                os.unlink(self.path)  # never leave a truncated stack behind
                raise ValueError(
                    f"wrote {self._z_written} of {self.shape[0]} pages")

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None and self._f is not None:
            self._f.close()
            self._f = None
            if os.path.exists(self.path):
                os.unlink(self.path)
            return False
        self.close()
        return False


def _page(sl: np.ndarray) -> Image.Image:
    if sl.dtype == np.uint16:
        return Image.fromarray(sl, mode="I;16")
    if sl.dtype in (np.float32, np.float64):
        return Image.fromarray(sl.astype(np.float32), mode="F")
    return Image.fromarray(sl)
