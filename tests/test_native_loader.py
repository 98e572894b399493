"""Native C++ raster loader vs the pure-Python reader, on real files."""

import glob
import time

import numpy as np
import pytest

from sifsr_tpu.data.native_loader import load_batch, native_available, read_tiff
from sifsr_tpu.geo.tiff import read_geotiff, write_geotiff

ASTER_TIFS = sorted(glob.glob("/root/reference/test_data_formatted/data/*_aster_250m.tif"))

needs_native = pytest.mark.skipif(not native_available(), reason="no g++/zlib toolchain")


@needs_native
@pytest.mark.skipif(not ASTER_TIFS, reason="reference test rasters not mounted")
def test_native_matches_python_on_reference_rasters():
    for path in ASTER_TIFS[:5]:
        want = read_geotiff(path).array.astype(np.float32)
        got = read_tiff(path)
        np.testing.assert_array_equal(got, want)


@needs_native
def test_native_roundtrip_own_writer(tmp_path, rng):
    arr = rng.normal(size=(57, 43)).astype(np.float32)
    path = str(tmp_path / "x.tif")
    write_geotiff(path, arr)
    np.testing.assert_array_equal(read_tiff(path), arr)


@needs_native
def test_batch_load_with_normalisation(tmp_path, rng):
    paths = []
    arrays = []
    for i in range(16):
        arr = (290 + 10 * rng.random((64, 64))).astype(np.float32)
        p = str(tmp_path / f"{i}.tif")
        write_geotiff(p, arr)
        paths.append(p)
        arrays.append(arr)
    batch = load_batch(paths, 64, 64, mean=295.0, std=10.0, n_threads=4)
    want = (np.stack(arrays) - 295.0) / 10.0
    np.testing.assert_allclose(batch, want, rtol=1e-6)


@needs_native
def test_batch_shape_mismatch_errors(tmp_path, rng):
    p1 = str(tmp_path / "a.tif")
    p2 = str(tmp_path / "b.tif")
    write_geotiff(p1, rng.normal(size=(64, 64)).astype(np.float32))
    write_geotiff(p2, rng.normal(size=(32, 32)).astype(np.float32))
    with pytest.raises(IOError):
        load_batch([p1, p2], 64, 64)


@needs_native
@pytest.mark.skipif(len(ASTER_TIFS) < 20, reason="need enough rasters to time")
def test_parallel_batch_is_faster_than_python():
    paths = ASTER_TIFS[:20]
    h, w = read_geotiff(paths[0]).array.shape
    # same-shape subset only
    paths = [p for p in paths if read_geotiff(p).array.shape == (h, w)]
    if len(paths) < 4:
        pytest.skip("too few same-shape rasters")
    t0 = time.perf_counter()
    for p in paths:
        read_geotiff(p)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    load_batch(paths, h, w, n_threads=8)
    t_native = time.perf_counter() - t0
    assert t_native < t_py  # parallel native decode beats sequential python


def test_streaming_dataset_matches_materialised(tmp_path, rng):
    """StreamingModisDataset must yield the same shuffled batches as
    ModisDataset for the same seed (prefetch is an implementation detail)."""
    import csv

    from sifsr_tpu.data.datasets import ModisDataset, StreamingModisDataset
    from sifsr_tpu.data.statistics import Statistics

    stats = Statistics(maxi=330.0, mini=260.0, mean_lst=300.0, std_lst=8.0,
                       mean_ndvi=0.3, std_ndvi=0.25)
    rows = []
    for i in range(7):
        lst_p = str(tmp_path / f"lst_{i}.tif")
        ndvi_p = str(tmp_path / f"ndvi_{i}.tif")
        write_geotiff(lst_p, (295 + 10 * rng.random((64, 64))).astype(np.float32))
        write_geotiff(ndvi_p, (0.6 * rng.random((256, 256))).astype(np.float32))
        rows.append({"LST": lst_p, "NDVI": ndvi_p, "split": "Train"})
    manifest = str(tmp_path / "manifest.csv")
    with open(manifest, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["LST", "NDVI", "split"])
        w.writeheader()
        w.writerows(rows)

    mat = ModisDataset(manifest, stats)
    stream = StreamingModisDataset(manifest, stats, prefetch=2)
    assert len(stream) == len(mat) == 7
    assert stream.n_batches(2) == mat.n_batches(2) == 3

    got = list(stream.batches(2, seed=13))
    want = list(mat.batches(2, seed=13))
    assert len(got) == len(want) == 3
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(g["lst"], w_["lst"], rtol=1e-6)
        np.testing.assert_allclose(g["ndvi"], w_["ndvi"], rtol=1e-6)


def test_streaming_dataset_surfaces_decode_errors(tmp_path):
    import csv

    from sifsr_tpu.data.datasets import StreamingModisDataset
    from sifsr_tpu.data.statistics import Statistics

    stats = Statistics(maxi=330.0, mini=260.0, mean_lst=300.0, std_lst=8.0,
                       mean_ndvi=0.3, std_ndvi=0.25)
    manifest = str(tmp_path / "manifest.csv")
    with open(manifest, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["LST", "NDVI", "split"])
        w.writeheader()
        w.writerow({"LST": str(tmp_path / "missing.tif"),
                    "NDVI": str(tmp_path / "missing2.tif"), "split": "Train"})

    stream = StreamingModisDataset(manifest, stats)
    with pytest.raises(Exception):
        list(stream.batches(1, seed=0))


def test_streaming_dataset_abandoned_epoch_stops_producer(tmp_path, rng):
    """Breaking out of batches() mid-epoch must retire the producer thread
    (it previously blocked forever on a full queue, leaking one daemon
    thread + its decoded batches per abandoned epoch)."""
    import csv
    import threading

    from sifsr_tpu.data.datasets import StreamingModisDataset
    from sifsr_tpu.data.statistics import Statistics

    stats = Statistics(maxi=330.0, mini=260.0, mean_lst=300.0, std_lst=8.0,
                       mean_ndvi=0.3, std_ndvi=0.25)
    rows = []
    for i in range(8):
        lst_p = str(tmp_path / f"lst_{i}.tif")
        ndvi_p = str(tmp_path / f"ndvi_{i}.tif")
        write_geotiff(lst_p, (295 + 10 * rng.random((64, 64))).astype(np.float32))
        write_geotiff(ndvi_p, (0.6 * rng.random((256, 256))).astype(np.float32))
        rows.append({"LST": lst_p, "NDVI": ndvi_p, "split": "Train"})
    manifest = str(tmp_path / "manifest.csv")
    with open(manifest, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["LST", "NDVI", "split"])
        w.writeheader()
        w.writerows(rows)

    before = threading.active_count()
    stream = StreamingModisDataset(manifest, stats, prefetch=1)
    for _ in range(3):  # abandon three epochs after one batch each
        for batch in stream.batches(1, seed=0):
            assert batch["lst"].shape == (1, 64, 64, 1)
            break
    deadline = time.perf_counter() + 10.0
    while threading.active_count() > before and time.perf_counter() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


# ------------------------------------------------------- hostile/corrupt TIFFs

def _tif_bytes(arr):
    """A valid little TIFF as bytes (via the project writer)."""
    import io, os, tempfile
    fd, p = tempfile.mkstemp(suffix=".tif")
    os.close(fd)
    try:
        write_geotiff(p, arr)
        with open(p, "rb") as f:
            return bytearray(f.read())
    finally:
        os.remove(p)


def _find_strip_offset_entry(data):
    """Locate the StripOffsets (273) IFD entry's value field."""
    import struct
    endian = "<" if data[:2] == b"II" else ">"
    (ifd,) = struct.unpack(endian + "I", data[4:8])
    (n,) = struct.unpack(endian + "H", data[ifd:ifd + 2])
    for i in range(n):
        e = ifd + 2 + 12 * i
        tag, typ, count = struct.unpack(endian + "HHI", data[e:e + 8])
        if tag == 273:
            return e + 8, endian
    raise AssertionError("no StripOffsets tag")


@needs_native
def test_native_rejects_lying_strip_offset(tmp_path, rng):
    """A strip offset pointing past EOF must error, not read out of bounds."""
    import struct
    arr = rng.normal(size=(16, 16)).astype(np.float32)
    data = _tif_bytes(arr)
    off_field, endian = _find_strip_offset_entry(data)
    data[off_field:off_field + 4] = struct.pack(endian + "I", len(data) + 4096)
    bad = tmp_path / "lying_offset.tif"
    bad.write_bytes(bytes(data))
    with pytest.raises(IOError):
        read_tiff(str(bad))


@needs_native
def test_native_rejects_truncated_file(tmp_path, rng):
    arr = rng.normal(size=(32, 32)).astype(np.float32)
    data = _tif_bytes(arr)
    for cut in (10, len(data) // 2, len(data) - 16):
        bad = tmp_path / f"trunc_{cut}.tif"
        bad.write_bytes(bytes(data[:cut]))
        with pytest.raises(IOError):
            read_tiff(str(bad))


@needs_native
def test_native_rejects_garbage_and_empty(tmp_path):
    empty = tmp_path / "empty.tif"
    empty.write_bytes(b"")
    garbage = tmp_path / "garbage.tif"
    garbage.write_bytes(b"\x89PNG\r\n\x1a\nnot a tiff at all" * 4)
    for p in (empty, garbage):
        with pytest.raises(IOError):
            read_tiff(str(p))


@needs_native
def test_batch_load_surfaces_corrupt_member(tmp_path, rng):
    """One corrupt file in a batch must fail the batch load cleanly."""
    paths = []
    for i in range(4):
        arr = (290 + 10 * rng.random((8, 8))).astype(np.float32)
        p = str(tmp_path / f"{i}.tif")
        write_geotiff(p, arr)
        paths.append(p)
    (tmp_path / "1.tif").write_bytes(b"II*\x00garbage")
    with pytest.raises(IOError):
        load_batch(paths, height=8, width=8)


@needs_native
def test_native_rejects_lying_tag_count(tmp_path, rng):
    """A StripOffsets entry claiming ~4 billion values (fuzzer find) must be
    rejected up front — it previously drove a 15 GB resize + O(count) loop."""
    import struct, time
    arr = rng.normal(size=(16, 16)).astype(np.float32)
    data = _tif_bytes(arr)
    off_field, endian = _find_strip_offset_entry(data)
    # count field sits 4 bytes before the value field
    data[off_field - 4:off_field] = struct.pack(endian + "I", 0xE0000001)
    bad = tmp_path / "lying_count.tif"
    bad.write_bytes(bytes(data))
    t0 = time.monotonic()
    with pytest.raises(IOError):
        read_tiff(str(bad))
    assert time.monotonic() - t0 < 5.0


@needs_native
def test_tiled_tiff_falls_back_to_python(tmp_path, rng):
    """A valid tiled TIFF (GDAL's default for larger rasters) is decoded via
    the pure-python fallback — UNSUPPORTED routes there, corrupt still raises."""
    from tests.test_geo_tiff import _build_tiled_tiff

    arr = rng.normal(size=(24, 40)).astype(np.float32)
    p = str(tmp_path / "tiled.tif")
    with open(p, "wb") as f:
        f.write(_build_tiled_tiff(arr, 16, 16, compress=True))
    np.testing.assert_array_equal(read_tiff(p), arr)

    # batch path: one tiled member reroutes the batch through python
    strip = str(tmp_path / "strip.tif")
    write_geotiff(strip, arr)
    batch = load_batch([strip, p], height=24, width=40, mean=1.0, std=2.0)
    np.testing.assert_allclose(batch, np.stack([(arr - 1.0) / 2.0] * 2), rtol=1e-6)


@needs_native
def test_int32_tiff_falls_back_not_zeros(tmp_path, rng):
    """An Int32 TIFF (GDAL-common, not in the native convert() set) must NOT
    silently decode to zeros — the native parser reports UNSUPPORTED and the
    python reader (which handles i4) decodes it."""
    import struct
    arr = rng.integers(-20000, 20000, (9, 7)).astype("<i4")
    raw = arr.tobytes()
    ifd_off = 8 + len(raw)
    entries = [
        (256, 3, 1, 7), (257, 3, 1, 9), (258, 3, 1, 32), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 3, 1, 9),
        (279, 4, 1, len(raw)), (339, 3, 1, 2),
    ]
    out = struct.pack("<2sHI", b"II", 42, ifd_off) + raw
    out += struct.pack("<H", len(entries))
    for tag, typ, count, val in sorted(entries):
        out += struct.pack("<HHII", tag, typ, count, val)
    out += struct.pack("<I", 0)
    p = str(tmp_path / "i32.tif")
    with open(p, "wb") as f:
        f.write(out)
    got = read_tiff(p)
    np.testing.assert_array_equal(got, arr.astype(np.float32))
