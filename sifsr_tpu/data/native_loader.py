"""ctypes bindings for the native raster loader (native/sifsr_native.cpp).

Builds on demand (g++ -O3 -shared -lz) if the shared object is missing, and
falls back to the pure-Python GeoTIFF reader when no toolchain is available —
the API is identical either way.

    batch = load_batch(paths, height=64, width=64, mean=295.0, std=10.0,
                       n_threads=8)   # (N, H, W) float32, decoded in parallel
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["native_available", "read_tiff", "load_batch"]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, os.pardir, "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "sifsr_native.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libsifsr_native.so"))

_lib = None
_tried = False

# native/sifsr_native.cpp return code: valid file, unsupported layout
_ERR_UNSUPPORTED = -3


def _load_library():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and os.path.exists(_SRC):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC, "-lz", "-lpthread"],
                check=True,
                capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.sifsr_tiff_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.sifsr_tiff_info.restype = ctypes.c_int
    lib.sifsr_tiff_read_f32.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.sifsr_tiff_read_f32.restype = ctypes.c_int
    lib.sifsr_load_batch_f32.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
    ]
    lib.sifsr_load_batch_f32.restype = ctypes.c_int
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_library() is not None


def read_tiff(path: str) -> np.ndarray:
    """Decode one TIFF to float32 (native fast path, python fallback).

    Single-band files return (H, W). Layouts the native decoder doesn't do
    (tiled, PackBits, multi-band, exotic dtypes) go through the python
    reader — multi-band then returns (H, W, S)."""
    lib = _load_library()
    if lib is None:
        from sifsr_tpu.geo.tiff import read_geotiff

        return read_geotiff(path).array.astype(np.float32)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    rc = lib.sifsr_tiff_info(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc == _ERR_UNSUPPORTED:
        # valid TIFF in a layout the fast path doesn't do (tiled, PackBits,
        # multi-band): route to the pure-python reader. Corrupt files
        # (other codes) still raise.
        from sifsr_tpu.geo.tiff import read_geotiff

        return read_geotiff(path).array.astype(np.float32)
    if rc != 0:
        raise IOError(f"sifsr_tiff_info({path}) -> {rc}")
    out = np.empty((h.value, w.value), np.float32)
    rc = lib.sifsr_tiff_read_f32(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size
    )
    if rc != 0:
        raise IOError(f"sifsr_tiff_read_f32({path}) -> {rc}")
    return out


def _read_band1(read_geotiff, path: str) -> np.ndarray:
    """Python-fallback single-raster read with a clear error for multi-band
    inputs (geo/tiff.py returns (H, W, S) for those; training batches are
    single-band by contract)."""
    arr = read_geotiff(path).array
    if arr.ndim != 2:
        raise ValueError(
            f"{path}: expected a single-band raster, got {arr.shape[-1]} bands"
        )
    return arr.astype(np.float32)


def load_batch(
    paths: list[str],
    height: int,
    width: int,
    mean: float = 0.0,
    std: float = 1.0,
    n_threads: int = 8,
) -> np.ndarray:
    """Decode + normalise a batch of same-shape TIFFs concurrently."""
    lib = _load_library()
    if lib is None:
        from sifsr_tpu.geo.tiff import read_geotiff

        out = np.stack([_read_band1(read_geotiff, p) for p in paths])
        return (out - mean) / std

    out = np.empty((len(paths), height, width), np.float32)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    rc = lib.sifsr_load_batch_f32(
        arr,
        len(paths),
        height,
        width,
        ctypes.c_float(mean),
        ctypes.c_float(1.0 / std),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    if rc == _ERR_UNSUPPORTED:
        # some member uses a layout the native path doesn't do: redo the
        # batch through the python reader (correctness over speed)
        from sifsr_tpu.geo.tiff import read_geotiff

        full = np.stack([_read_band1(read_geotiff, p) for p in paths])
        if full.shape[1:] != (height, width):
            raise IOError(
                f"load_batch: decoded shape {full.shape[1:]} != ({height}, {width})"
            )
        return (full - mean) / std
    if rc != 0:
        raise IOError(f"sifsr_load_batch_f32 -> {rc}")
    return out
