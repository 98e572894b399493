"""Granule ingest: patch extraction, QC/coverage rules, NDVI pairing."""

import numpy as np

from sifsr_tpu.data.ingest import (
    compute_ndvi,
    dilate_water_mask,
    extract_lst_patches,
    extract_ndvi_windows,
    georeference_error,
)

GT = (0.0, 926.625433, 0.0, 5559752.598333, 0.0, -926.625433)


def _granule(rng, h=256, w=256):
    lst = (290 + 10 * rng.random((h, w))).astype(np.float32)
    qc = np.zeros((h, w), np.uint8)
    return lst, qc


def test_all_valid_patches_extracted(rng):
    lst, qc = _granule(rng)
    ps = extract_lst_patches(lst, qc, GT, window=64, coverage=0.0)
    assert len(ps.block_index) == 16
    assert ps.patches.shape == (16, 64, 64)
    # serials are 1-based and unique
    assert ps.block_index.min() == 1 and len(set(ps.block_index)) == 16


def test_zero_pixels_reject_patch(rng):
    lst, qc = _granule(rng)
    lst[10, 10] = 0.0  # one bad pixel in block (row 0, col 0)
    ps = extract_lst_patches(lst, qc, GT, window=64, coverage=0.0)
    assert len(ps.block_index) == 15


def test_coverage_threshold_allows_bad_fraction(rng):
    lst, qc = _granule(rng)
    lst[:8, :8] = 0.0  # 64 bad pixels = 64/4096 of one patch
    ps_strict = extract_lst_patches(lst, qc, GT, window=64, coverage=0.0)
    ps_loose = extract_lst_patches(lst, qc, GT, window=64, coverage=0.02)
    assert len(ps_strict.block_index) == 15
    assert len(ps_loose.block_index) == 16


def test_qc_bit_rejection(rng):
    lst, qc = _granule(rng)
    qc[70, 70] = 1  # low bit set in block (1, 1) of the column-major order
    ps = extract_lst_patches(lst, qc, GT, window=64, coverage=0.0, check_qc_bits=True)
    assert len(ps.block_index) == 15
    ps_no_qc = extract_lst_patches(lst, qc, GT, window=64, coverage=0.0, check_qc_bits=False)
    assert len(ps_no_qc.block_index) == 16


def test_patch_content_matches_traversal(rng):
    """Column-major traversal: serial 1 = block (row 0, col 0), serial 2 =
    block (row 1, col 0) (reference us.split outer loop over shape[1])."""
    lst, qc = _granule(rng)
    ps = extract_lst_patches(lst, qc, GT, window=64, coverage=0.0)
    k1 = np.nonzero(ps.block_index == 1)[0][0]
    k2 = np.nonzero(ps.block_index == 2)[0][0]
    np.testing.assert_array_equal(ps.patches[k1], lst[:64, :64])
    np.testing.assert_array_equal(ps.patches[k2], lst[64:128, :64])


def test_ndvi_pairing_and_zero_denominator(rng):
    lst, qc = _granule(rng)
    ps = extract_lst_patches(lst, qc, GT, window=64, coverage=0.0)
    nir = (0.1 + 0.5 * rng.random((1024, 1024))).astype(np.float64)
    red = (0.05 + 0.3 * rng.random((1024, 1024))).astype(np.float64)
    # poison the window of serial 1 with a zero denominator
    nir[5, 5] = 0.2
    red[5, 5] = -0.2
    gt_ndvi = (GT[0], GT[1] / 4, 0.0, GT[3], 0.0, GT[5] / 4)
    ndvi_set, kept = extract_ndvi_windows(nir, red, gt_ndvi, ps.block_index, window=256)
    assert kept.sum() == 15
    assert 1 not in ndvi_set.block_index
    assert np.abs(ndvi_set.patches).max() <= 1.0
    # pair origins must coincide (same grid), georef error ~0
    k = np.nonzero(ps.block_index == ndvi_set.block_index[0])[0][0]
    err = georeference_error(ps.geotransforms[k], ndvi_set.geotransforms[0])
    assert err < 1e-6


def test_ndvi_values(rng):
    nir = np.full((4, 4), 0.5)
    red = np.full((4, 4), 0.1)
    np.testing.assert_allclose(compute_ndvi(nir, red), (0.4) / (0.6))


def test_water_mask_dilation():
    mask = np.zeros((16, 16), np.uint8)
    mask[8, 8] = 1
    out = dilate_water_mask(mask, 5)
    assert out[6:11, 6:11].all()
    assert not out[0, 0]
