"""Unaligned-raster DMS (baselines/dms_rasters — the reference's ORIGINAL
data_mining_sharpener.py workflow, data_mining_sharpener.py:429-967)."""

import numpy as np
import pytest

from sifsr_tpu.baselines.dms import dms_sharpen
from sifsr_tpu.baselines.dms_rasters import (
    bin_to_grid, resample_bilinear_to_grid, sharpen_rasters)


def _scene(rng, lh=24, lw=24, f=4):
    """Synthetic NDVI->LST scene with a known linear relationship + texture."""
    hh, hw = lh * f, lw * f
    yy, xx = np.mgrid[0:hh, 0:hw]
    ndvi = 0.3 + 0.25 * np.sin(yy / 19.0) + 0.2 * np.cos(xx / 13.0)
    ndvi += 0.02 * rng.standard_normal((hh, hw))
    lst_hr = 310.0 - 18.0 * ndvi + 0.3 * rng.standard_normal((hh, hw))
    lst_lr = lst_hr.reshape(lh, f, lw, f).mean(axis=(1, 3))
    return ndvi, lst_hr, lst_lr


def test_bin_to_grid_matches_block_mean_when_aligned(rng):
    """On aligned integer-factor grids the center binning IS the block mean."""
    src = rng.random((32, 40))
    src_gt = (500.0, 10.0, 0.0, 800.0, 0.0, -10.0)
    dst_gt = (500.0, 40.0, 0.0, 800.0, 0.0, -40.0)
    out, counts = bin_to_grid(src, src_gt, (8, 10), dst_gt)
    want = src.reshape(8, 4, 10, 4).mean(axis=(1, 3))
    np.testing.assert_allclose(out, want, rtol=1e-12)
    assert (counts == 16).all()


def test_bin_to_grid_unaligned_offset_grid(rng):
    """A half-LR-cell offset destination grid: bins shift accordingly and
    edge cells with no source centers come back NaN."""
    src = np.ones((8, 8))
    src_gt = (0.0, 1.0, 0.0, 8.0, 0.0, -1.0)
    dst_gt = (-2.0, 4.0, 0.0, 10.0, 0.0, -4.0)  # offset by half a dst cell
    out, counts = bin_to_grid(src, src_gt, (3, 3), dst_gt)
    assert np.isfinite(out).sum() > 0
    assert counts.sum() == 64  # every source center lands somewhere
    np.testing.assert_allclose(out[np.isfinite(out)], 1.0)


def test_bilinear_to_grid_recovers_linear_field():
    """Bilinear resampling reproduces an affine-in-world-coords field
    exactly (away from the border extrapolation zone)."""
    src_gt = (100.0, 2.0, 0.0, 300.0, 0.0, -2.0)
    h, w = 20, 24
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    x = src_gt[0] + (jj + 0.5) * src_gt[1]
    y = src_gt[3] + (ii + 0.5) * src_gt[5]
    src = 3.0 * x - 0.5 * y + 7.0
    dst_gt = (103.0, 0.7, 0.0, 295.0, 0.0, -0.9)
    out = resample_bilinear_to_grid(src, src_gt, (12, 14), dst_gt)
    jj, ii = np.meshgrid(np.arange(14), np.arange(12))
    xd = dst_gt[0] + (jj + 0.5) * dst_gt[1]
    yd = dst_gt[3] + (ii + 0.5) * dst_gt[5]
    want = 3.0 * xd - 0.5 * yd + 7.0
    np.testing.assert_allclose(out[1:-1, 1:-1], want[1:-1, 1:-1], rtol=1e-9)


def test_sharpen_rasters_aligned_close_to_patch_dms(rng):
    """On ALIGNED grids the raster pipeline must essentially reproduce the
    patch-aligned dms_sharpen (same binning/training; the residual comes
    back bilinear instead of bicubic, so allow a small tolerance)."""
    ndvi, lst_hr, lst_lr = _scene(rng)
    f = 4
    hr_gt = (0.0, 250.0, 0.0, 0.0, 0.0, -250.0)
    lr_gt = (0.0, 1000.0, 0.0, 0.0, 0.0, -1000.0)
    got = sharpen_rasters(lst_lr, lr_gt, ndvi, hr_gt)
    want = dms_sharpen(lst_lr, ndvi, factor=f)
    assert np.isfinite(got).all()
    # interiors agree closely; residual resampler differs (bilinear/bicubic)
    d = np.abs(got[4:-4, 4:-4] - want[4:-4, 4:-4])
    assert np.median(d) < 0.25, np.median(d)
    # and it beats the trivial baseline by a wide margin
    rmse = float(np.sqrt(np.mean((got - lst_hr) ** 2)))
    rmse_flat = float(np.sqrt(np.mean((np.repeat(np.repeat(
        lst_lr, f, 0), f, 1) - lst_hr) ** 2)))
    assert rmse < rmse_flat


def test_sharpen_rasters_unaligned_grids(rng):
    """The headline capability: HR and LR grids with non-integer ratio and
    offset origins (the case the `_modified` patch variant cannot do)."""
    ndvi, lst_hr, lst_lr = _scene(rng)
    hr_gt = (137.0, 231.0, 0.0, -950.0, 0.0, -233.0)
    # LR grid: ~3.7x coarser, different origin
    lr_gt = (0.0, 860.0, 0.0, -700.0, 0.0, -871.0)
    lh = int(ndvi.shape[0] * 233 / 871) + 1
    lw = int(ndvi.shape[1] * 231 / 860) + 1
    lst_lr_u, _ = bin_to_grid(lst_hr, hr_gt, (lh, lw), lr_gt)
    lst_lr_u = np.where(np.isfinite(lst_lr_u), lst_lr_u, np.nan)
    got = sharpen_rasters(lst_lr_u, lr_gt, ndvi, hr_gt)
    assert got.shape == ndvi.shape
    assert np.isfinite(got).all()
    rmse = float(np.sqrt(np.mean((got - lst_hr) ** 2)))
    assert rmse < 1.0, rmse  # recovers the HR field on mismatched grids


def test_sharpen_rasters_moving_windows_and_crs(rng):
    """Gao §2.3 moving windows on unaligned grids + a CRS hop through the
    repo's sinusoidal<->UTM transforms."""
    from sifsr_tpu.geo.projection import sinusoidal_to_utm, utm_to_sinusoidal

    ndvi, lst_hr, lst_lr = _scene(rng, lh=16, lw=16)
    # HR raster in MODIS sinusoidal around zone-31 longitudes
    hr_gt = (300000.0, 231.65, 0.0, 4900000.0, 0.0, -231.65)
    epsg = 32631
    # LR grid in UTM: derive from the HR bounds
    x0, y0 = sinusoidal_to_utm(hr_gt[0], hr_gt[3], epsg)
    lr_gt = (float(x0), 1000.0, 0.0, float(y0), 0.0, -1000.0)
    lh = lw = 18
    to_lr = lambda x, y: sinusoidal_to_utm(x, y, epsg)
    to_hr = lambda x, y: utm_to_sinusoidal(x, y, epsg)
    lst_lr_u, counts = bin_to_grid(lst_hr, hr_gt, (lh, lw), lr_gt,
                                   transform=to_lr)
    got = sharpen_rasters(lst_lr_u, lr_gt, ndvi, hr_gt, to_lr=to_lr,
                          to_hr=to_hr, moving_window_size=6)
    assert got.shape == ndvi.shape
    assert np.isfinite(got).all()
    valid = counts > 0
    assert valid.any()
    # prediction should track the true HR field where LR training data exist
    err = np.abs(got - lst_hr)
    assert np.median(err) < 1.5, np.median(err)
