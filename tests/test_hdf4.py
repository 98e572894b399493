"""HDF4 reader/writer round-trips + MODIS product reader behaviour."""

import numpy as np
import pytest

from sifsr_tpu.geo.hdf4 import HDF4File, read_modis_lst, read_modis_nir_red, write_hdf4_sds

STRUCT_META = """GROUP=GridStructure
\tGROUP=GRID_1
\t\tXDim=1200
\t\tYDim=1200
\t\tUpperLeftPointMtrs=(0.000000,5559752.598333)
\t\tLowerRightMtrs=(1111950.519667,4447802.078667)
\tEND_GROUP=GRID_1
END_GROUP=GridStructure
END
"""


def test_roundtrip_plain(tmp_path, rng):
    arr = (rng.random((37, 53)) * 1000).astype(np.uint16)
    path = str(tmp_path / "plain.hdf")
    write_hdf4_sds(path, {"LST_Day_1km": arr})
    f = HDF4File(path)
    assert f.sds_names() == ["LST_Day_1km"]
    np.testing.assert_array_equal(f.read_sds("LST_Day_1km"), arr)


def test_roundtrip_deflate_and_float(tmp_path, rng):
    arr = rng.normal(size=(40, 40)).astype(np.float32)
    path = str(tmp_path / "deflate.hdf")
    write_hdf4_sds(path, {"field": arr}, deflate=True)
    np.testing.assert_array_equal(HDF4File(path).read_sds("field"), arr)


def test_multiple_sds_and_metadata(tmp_path, rng):
    lst = (rng.random((64, 64)) * 15000 + 10000).astype(np.uint16)
    qc = rng.integers(0, 4, size=(64, 64)).astype(np.uint8)
    path = str(tmp_path / "granule.hdf")
    write_hdf4_sds(
        path, {"LST_Day_1km": lst, "QC_Day": qc}, struct_metadata=STRUCT_META, deflate=True
    )
    f = HDF4File(path)
    assert set(f.sds_names()) == {"LST_Day_1km", "QC_Day"}
    gt = f.grid_geotransform()
    assert gt is not None
    assert gt[0] == 0.0
    assert abs(gt[1] - 1111950.519667 / 1200) < 1e-6
    assert abs(gt[3] - 5559752.598333) < 1e-6
    assert gt[5] < 0


def test_read_modis_lst_scaling(tmp_path, rng):
    dn = (rng.random((32, 32)) * 15000 + 10000).astype(np.uint16)
    qc = np.zeros((32, 32), np.uint8)
    path = str(tmp_path / "mod21.hdf")
    write_hdf4_sds(path, {"LST_Day_1KM": dn, "QC_Day": qc}, struct_metadata=STRUCT_META)
    lst, qc_out, gt = read_modis_lst(path, "day", with_qc=True)
    np.testing.assert_allclose(lst, dn.astype(np.float32) * 0.02, rtol=1e-6)
    assert qc_out is not None and gt is not None


def test_read_modis_nir_red_scaling(tmp_path, rng):
    red = (rng.random((48, 48)) * 10000).astype(np.int16)
    nir = (rng.random((48, 48)) * 10000).astype(np.int16)
    path = str(tmp_path / "mod09.hdf")
    write_hdf4_sds(
        path, {"sur_refl_b01_1": red, "sur_refl_b02_1": nir}, struct_metadata=STRUCT_META
    )
    r, n, gt = read_modis_nir_red(path)
    np.testing.assert_allclose(r, red.astype(np.float32) * 1e-4, rtol=1e-5)
    np.testing.assert_allclose(n, nir.astype(np.float32) * 1e-4, rtol=1e-5)


def test_missing_sds_raises(tmp_path, rng):
    path = str(tmp_path / "x.hdf")
    write_hdf4_sds(path, {"a": np.zeros((4, 4), np.float32)})
    with pytest.raises(KeyError):
        HDF4File(path).read_sds("nope")


def test_read_modis_lst_night(tmp_path, rng):
    dn = (rng.random((16, 16)) * 15000 + 10000).astype(np.uint16)
    path = str(tmp_path / "night.hdf")
    write_hdf4_sds(path, {"LST_Night_1km": dn, "QC_Night": np.zeros((16, 16), np.uint8)},
                   struct_metadata=STRUCT_META)
    lst, gt = read_modis_lst(path, "night")
    np.testing.assert_allclose(lst, dn.astype(np.float32) * 0.02, rtol=1e-6)
