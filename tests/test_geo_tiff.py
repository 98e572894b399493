"""GeoTIFF I/O: read the reference test-set rasters, round-trip our writer."""

import glob

import numpy as np
import pytest

from sifsr_tpu.geo import read_geotiff, write_geotiff

ASTER_TIFS = sorted(glob.glob("/root/reference/test_data_formatted/data/*_aster_250m.tif"))


@pytest.mark.skipif(not ASTER_TIFS, reason="reference test data not mounted")
def test_read_reference_aster_tiff():
    gt = read_geotiff(ASTER_TIFS[0])
    assert gt.array.ndim == 2
    assert gt.array.dtype == np.float32
    assert gt.geotransform is not None
    # ASTER LST stored as DN = K*10 (the ASTER 0.1 scale factor is applied on
    # read, reference utils.py:456); nodata regions are 0
    valid = gt.array[gt.array > 1000]
    assert valid.size > 0
    assert 2000 < valid.mean() < 3500
    # UTM zone EPSG from geokeys (e.g. 32631)
    assert gt.epsg() is not None and 32600 < gt.epsg() < 32800


@pytest.mark.skipif(len(ASTER_TIFS) < 5, reason="reference test data not mounted")
def test_read_all_reference_tiffs_headers():
    for path in ASTER_TIFS[:5]:
        gt = read_geotiff(path)
        assert gt.array.shape[0] > 100 and gt.array.shape[1] > 100


def test_write_read_roundtrip(tmp_path, rng):
    arr = rng.normal(size=(57, 43)).astype(np.float32)
    geo = (347655.0, 250.0, 0.0, 4830525.0, 0.0, -250.0)
    path = str(tmp_path / "roundtrip.tif")
    write_geotiff(path, arr, geotransform=geo, epsg=32631, geo_ascii="WGS 84 / UTM zone 31N")
    back = read_geotiff(path)
    np.testing.assert_array_equal(back.array, arr)
    assert back.geotransform == pytest.approx(geo)
    assert back.epsg() == 32631


def test_write_read_roundtrip_float64_and_nodata(tmp_path, rng):
    arr = rng.normal(size=(8, 8))
    path = str(tmp_path / "f64.tif")
    write_geotiff(path, arr, nodata=-9999.0)
    back = read_geotiff(path)
    np.testing.assert_array_equal(back.array, arr)
    assert back.nodata == -9999.0


# --------------------------------------------------- corrupt-input behaviour

def _tiff_bytes(arr):
    import os, tempfile
    fd, p = tempfile.mkstemp(suffix=".tif")
    os.close(fd)
    try:
        write_geotiff(p, arr)
        with open(p, "rb") as f:
            return bytearray(f.read())
    finally:
        os.remove(p)


def test_read_rejects_non_tiff(tmp_path):
    p = tmp_path / "x.tif"
    for payload in (b"", b"\x89PNG\r\n", b"II+\x00bigtiff-ish"):
        p.write_bytes(payload)
        with pytest.raises((ValueError, Exception)):
            read_geotiff(str(p))


def test_read_raises_on_truncation(tmp_path, rng):
    """Every truncation point must raise — never return silent garbage."""
    data = _tiff_bytes(rng.normal(size=(16, 16)).astype(np.float32))
    p = tmp_path / "t.tif"
    for cut in (4, 64, len(data) // 2, len(data) - 8):
        p.write_bytes(bytes(data[:cut]))
        with pytest.raises(Exception):
            read_geotiff(str(p))


def test_read_raises_on_lying_strip_offset(tmp_path, rng):
    import struct
    data = _tiff_bytes(rng.normal(size=(16, 16)).astype(np.float32))
    endian = "<"
    (ifd,) = struct.unpack(endian + "I", data[4:8])
    (n,) = struct.unpack(endian + "H", data[ifd:ifd + 2])
    for i in range(n):
        e = ifd + 2 + 12 * i
        tag, typ, count = struct.unpack(endian + "HHI", data[e:e + 8])
        if tag == 273:
            data[e + 8:e + 12] = struct.pack(endian + "I", len(data) + 999)
    p = tmp_path / "lying.tif"
    p.write_bytes(bytes(data))
    with pytest.raises(Exception):
        read_geotiff(str(p))


def test_read_rejects_billion_count_tag(tmp_path, rng):
    """A RowsPerStrip tag mutated to count=2^30 (fuzzer find) must raise
    instantly — the unpack format is built with a numeric repeat count and
    the value block is length-validated before any O(count) work."""
    import struct, time
    data = _tiff_bytes(rng.normal(size=(16, 16)).astype(np.float32))
    endian = "<"
    (ifd,) = struct.unpack(endian + "I", data[4:8])
    (n,) = struct.unpack(endian + "H", data[ifd:ifd + 2])
    for i in range(n):
        e = ifd + 2 + 12 * i
        tag, typ, count = struct.unpack(endian + "HHI", data[e:e + 8])
        if tag == 278:  # RowsPerStrip
            data[e + 4:e + 8] = struct.pack(endian + "I", 1 << 30)
    p = tmp_path / "bigcount.tif"
    p.write_bytes(bytes(data))
    t0 = time.monotonic()
    with pytest.raises(ValueError):
        read_geotiff(str(p))
    assert time.monotonic() - t0 < 2.0


def _build_tiled_tiff(arr, tw, tl, compress=False):
    """Hand-assemble a tiled classic TIFF (the project writer only emits
    strips, so the tiled read path needs an independent fixture)."""
    import struct, zlib
    h, w = arr.shape
    assert arr.dtype == np.float32
    tiles = []
    for r0 in range(0, h, tl):
        for c0 in range(0, w, tw):
            tile = np.zeros((tl, tw), np.float32)
            blk = arr[r0:r0 + tl, c0:c0 + tw]
            tile[:blk.shape[0], :blk.shape[1]] = blk
            raw = tile.tobytes()
            tiles.append(zlib.compress(raw) if compress else raw)

    header_end = 8
    offsets, off = [], header_end
    for t in tiles:
        offsets.append(off)
        off += len(t)
    ifd_off = off
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 32),
        (259, 3, 1, 8 if compress else 1), (262, 3, 1, 1),
        (277, 3, 1, 1), (322, 3, 1, tw), (323, 3, 1, tl),
        (339, 3, 1, 3),
    ]
    n_arr = len(tiles)
    arr_area = ifd_off + 2 + 12 * (len(entries) + 2) + 4
    if n_arr == 1:
        entries.append((324, 4, 1, offsets[0]))
        entries.append((325, 4, 1, len(tiles[0])))
        tail = b""
    else:
        entries.append((324, 4, n_arr, arr_area))
        entries.append((325, 4, n_arr, arr_area + 4 * n_arr))
        tail = b"".join(struct.pack("<I", o) for o in offsets)
        tail += b"".join(struct.pack("<I", len(t)) for t in tiles)
    entries.sort()
    out = struct.pack("<2sHI", b"II", 42, ifd_off)
    out += b"".join(tiles)
    out += struct.pack("<H", len(entries))
    for tag, typ, count, val in entries:
        out += struct.pack("<HHII", tag, typ, count, val)
    out += struct.pack("<I", 0)
    out += tail
    return out


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("shape,tw,tl", [((32, 48), 16, 16), ((24, 40), 16, 16)])
def test_read_tiled_tiff(tmp_path, rng, compress, shape, tw, tl):
    """Tiled TIFFs (GDAL's default layout for larger rasters) decode
    correctly, including edge-clipped partial tiles."""
    arr = rng.normal(size=shape).astype(np.float32)
    p = tmp_path / "tiled.tif"
    p.write_bytes(_build_tiled_tiff(arr, tw, tl, compress=compress))
    g = read_geotiff(str(p))
    np.testing.assert_array_equal(g.array, arr)


def _build_multiband_tiff(arr_hws):
    """Chunky (PlanarConfig=1) multi-band float32 TIFF, one strip."""
    import struct
    h, w, s = arr_hws.shape
    raw = arr_hws.astype("<f4").tobytes()  # interleaved by construction
    ifd_off = 8 + len(raw)
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 32), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, s), (278, 3, 1, h),
        (279, 4, 1, len(raw)), (284, 3, 1, 1), (339, 3, 1, 3),
    ]
    out = struct.pack("<2sHI", b"II", 42, ifd_off) + raw
    out += struct.pack("<H", len(entries))
    for tag, typ, count, val in sorted(entries):
        out += struct.pack("<HHII", tag, typ, count, val)
    out += struct.pack("<I", 0)
    return out


def test_deflate_bomb_bounded(tmp_path):
    """A few-KB strip that inflates to ~64 MB must fail cleanly (bounded
    decompressobj, same guard as the HDF4 reader) instead of allocating the
    whole payload: read_geotiff is the designated fallback for files the
    native decoder rejects and for serve-daemon job inputs."""
    import struct
    import zlib

    h = w = 4  # expected strip = 64 bytes
    bomb = zlib.compress(b"\x00" * (64 * 2**20), 9)  # ~64 KB on disk
    ifd_off = 8 + len(bomb)
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 32), (259, 3, 1, 8),
        (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 3, 1, h),
        (279, 4, 1, len(bomb)), (339, 3, 1, 3),
    ]
    out = struct.pack("<2sHI", b"II", 42, ifd_off) + bomb
    out += struct.pack("<H", len(entries))
    for tag, typ, count, val in sorted(entries):
        out += struct.pack("<HHII", tag, typ, count, val)
    out += struct.pack("<I", 0)
    p = tmp_path / "bomb.tif"
    p.write_bytes(out)
    with pytest.raises(ValueError):
        read_geotiff(str(p))


def test_read_multiband_chunky(tmp_path, rng):
    """2-band chunky TIFF (e.g. a GDAL-converted NIR/Red MOD09GQ) reads as
    (H, W, S); single-band files keep returning (H, W)."""
    arr = rng.normal(size=(12, 10, 2)).astype(np.float32)
    p = tmp_path / "mb.tif"
    p.write_bytes(_build_multiband_tiff(arr))
    g = read_geotiff(str(p))
    assert g.array.shape == (12, 10, 2)
    np.testing.assert_array_equal(g.array, arr)
