"""Mosaic tile loading: the native data path for batch pipelines.

Large stitched mosaics (8k^2+ LEEM/STM scans) are processed as stacks
of tiles by the batch-sharded pipelines (pygpa_tpu.parallel). The
reference relies on dask's Python-side lazy chunking; here tile
extraction runs in a memory-mapped, multithreaded C++ loader
(native/tileloader.cpp, compiled on first use, bound via ctypes — no
pybind11 dependency) so host IO overlaps device compute.

File format "GPAM": 32-byte header (magic, dtype code, H, W) + row-
major pixels; write_mosaic() creates it from an array.
"""
import ctypes
import os
import subprocess

import numpy as np

_DTYPES = {0: np.uint8, 1: np.uint16, 2: np.float32, 3: np.float64}
_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}

_lib = None


def _native_dir():
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native")


def _load_library():
    """Compile (once) and load the native loader."""
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_native_dir(), "tileloader.cpp")
    so = os.path.join(_native_dir(), "libtileloader.so")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             src, "-o", so], check=True)
    lib = ctypes.CDLL(so)
    lib.tl_open.restype = ctypes.c_void_p
    lib.tl_open.argtypes = [ctypes.c_char_p]
    lib.tl_info.restype = ctypes.c_int
    lib.tl_info.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_uint32),
                            ctypes.POINTER(ctypes.c_uint64),
                            ctypes.POINTER(ctypes.c_uint64)]
    lib.tl_read_tiles.restype = ctypes.c_int
    lib.tl_read_tiles.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int]
    lib.tl_close.restype = None
    lib.tl_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def write_mosaic(path, array):
    """Write an array as a GPAM mosaic file."""
    array = np.ascontiguousarray(array)
    code = _CODES[array.dtype]
    with open(path, "wb") as f:
        f.write(b"GPAM")
        f.write(np.uint32(code).tobytes())
        f.write(np.uint64(array.shape[0]).tobytes())
        f.write(np.uint64(array.shape[1]).tobytes())
        f.write(np.uint64(0).tobytes())
        f.write(array.tobytes())


class MosaicTiles:
    """Memory-mapped tiled view of a mosaic file.

    Usage::

        with MosaicTiles("scan.gpam") as mt:
            for batch, coords in mt.batches(tile=2048, batch_size=8):
                us = extract_displacement_field_batch(batch, ks, mesh)
    """

    def __init__(self, path, nthreads=None):
        self._lib = _load_library()
        self._h = self._lib.tl_open(os.fsencode(path))
        if not self._h:
            raise OSError(f"cannot open mosaic {path!r}")
        dt = ctypes.c_uint32()
        hh = ctypes.c_uint64()
        ww = ctypes.c_uint64()
        self._lib.tl_info(self._h, ctypes.byref(dt), ctypes.byref(hh),
                          ctypes.byref(ww))
        self.dtype = np.dtype(_DTYPES[dt.value])
        self.shape = (int(hh.value), int(ww.value))
        self.nthreads = nthreads or min(16, os.cpu_count() or 1)

    def read_tiles(self, origins, tile, normalize=True):
        """Extract tiles of shape `tile` at the given (y, x) origins.
        Returns a float32 (ntiles, th, tw) array (edge tiles clamp to
        the border). normalize subtracts each tile's mean in-pass (the
        pipelines' first step)."""
        th, tw = (tile, tile) if np.isscalar(tile) else tile
        origins = np.asarray(origins, np.int64).reshape(-1, 2)
        n = len(origins)
        out = np.empty((n, th, tw), np.float32)
        ys = np.ascontiguousarray(origins[:, 0])
        xs = np.ascontiguousarray(origins[:, 1])
        rc = self._lib.tl_read_tiles(
            self._h, ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, th, tw, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.nthreads, int(bool(normalize)))
        if rc != 0:
            raise RuntimeError("tile read failed")
        return out

    def grid(self, tile, overlap=0):
        """(y, x) origins of a full tiling with `overlap` pixels."""
        th, tw = (tile, tile) if np.isscalar(tile) else tile
        sy = max(1, th - overlap)
        sx = max(1, tw - overlap)
        ys = list(range(0, max(self.shape[0] - overlap, 1), sy))
        xs = list(range(0, max(self.shape[1] - overlap, 1), sx))
        return [(y, x) for y in ys for x in xs]

    def batches(self, tile, batch_size, overlap=0, normalize=True):
        """Yield (tiles (B, th, tw) f32, origins list) batches covering
        the mosaic; the trailing batch is padded by repeating its last
        tile (static shapes for jit)."""
        origins = self.grid(tile, overlap)
        for i in range(0, len(origins), batch_size):
            chunk = origins[i: i + batch_size]
            pad = batch_size - len(chunk)
            full = chunk + [chunk[-1]] * pad
            yield self.read_tiles(full, tile, normalize), chunk

    def close(self):
        if self._h:
            self._lib.tl_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
