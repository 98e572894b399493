"""Projection math: round-trip accuracy and known-value checks."""

import numpy as np

from sifsr_tpu.geo import projection as prj
from sifsr_tpu.geo.warp import bilinear_sample, warp_sinusoidal_to_utm


def test_sinusoidal_roundtrip(rng):
    x = rng.uniform(0, 1.1e6, 100)
    y = rng.uniform(4.4e6, 5.5e6, 100)
    lon, lat = prj.sinusoidal_to_lonlat(x, y)
    x2, y2 = prj.lonlat_to_sinusoidal(lon, lat)
    np.testing.assert_allclose(x2, x, atol=1e-6)
    np.testing.assert_allclose(y2, y, atol=1e-6)


def test_utm_roundtrip(rng):
    lon = rng.uniform(0.1, 5.9, 200)  # zone 31
    lat = rng.uniform(40.0, 52.0, 200)
    e, n = prj.lonlat_to_utm(lon, lat, 32631)
    lon2, lat2 = prj.utm_to_lonlat(e, n, 32631)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_utm_known_point():
    """Central-meridian point: lon=3 in zone 31 -> easting exactly 500000;
    northing = k0 * meridian arc length. Reference value from PROJ:
    (3E, 45N) -> (500000.000, 4982950.400) within a metre."""
    e, n = prj.lonlat_to_utm(3.0, 45.0, 32631)
    assert abs(float(e) - 500000.0) < 1e-6
    assert abs(float(n) - 4982950.4) < 1.0


def test_utm_south_hemisphere():
    e, n = prj.lonlat_to_utm(3.0, -10.0, 32731)
    assert 8_800_000 < float(n) < 9_000_000  # 10M false northing minus arc


def test_sinusoidal_modis_tile_h18v04():
    """Tile h18v04 covers 40-50N, x in [0, 1111950]m: its upper-left corner
    (x=0, y=50N) maps to lon 0."""
    lon, lat = prj.sinusoidal_to_lonlat(0.0, 50.0 * 111319.49079327358 * (6371007.181 / 6378137.0))
    assert abs(float(lon)) < 1e-9


def test_bilinear_sample_identity(rng):
    img = rng.normal(size=(16, 16))
    rows, cols = np.meshgrid(np.arange(16.0), np.arange(16.0), indexing="ij")
    out = bilinear_sample(img, rows, cols)
    np.testing.assert_allclose(out, img, atol=1e-12)


def test_warp_preserves_smooth_field():
    """Warping a smooth sinusoidal-grid field to UTM and sampling it back at
    transformed coordinates reproduces the analytic field."""
    h = w = 200
    gt = (400000.0, 900.0, 0.0, 5.1e6, 0.0, -900.0)

    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    x = gt[0] + (jj + 0.5) * gt[1]
    y = gt[3] + (ii + 0.5) * gt[5]
    field = np.sin(x / 5e4) + np.cos(y / 7e4)

    out = warp_sinusoidal_to_utm(field, gt, 32631)
    oh, ow = out.array.shape
    jj2, ii2 = np.meshgrid(np.arange(ow), np.arange(oh))
    ex = out.geotransform[0] + (jj2 + 0.5) * out.geotransform[1]
    ny = out.geotransform[3] + (ii2 + 0.5) * out.geotransform[5]
    sx, sy = prj.utm_to_sinusoidal(ex, ny, 32631)
    want = np.sin(sx / 5e4) + np.cos(sy / 7e4)

    inside = (
        (sx > gt[0] + 2 * gt[1])
        & (sx < gt[0] + (w - 2) * gt[1])
        & (sy < gt[3] + 2 * gt[5])
        & (sy > gt[3] + (h - 2) * gt[5])
    )
    err = np.abs(out.array - want)[inside]
    assert err.max() < 5e-3  # bilinear interpolation error on a smooth field
