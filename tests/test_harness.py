"""Eval-harness unit tests against the real reference test pairs (fast:
bicubic SR + the full geo chain run in well under a second per pair on CPU)."""

import os

import numpy as np
import pytest

from sifsr_tpu.baselines import bicubic_sr
from sifsr_tpu.eval.harness import (
    METRIC_COLUMNS,
    compute_pair_metrics,
    evaluate_pair,
    load_test_pair,
)

DATA = "/root/reference/test_data_formatted/data"
needs_data = pytest.mark.skipif(not os.path.isdir(DATA), reason="reference test data not mounted")


@needs_data
def test_load_test_pair_fields():
    pair = load_test_pair(f"{DATA}/0_data_dict.pkl")
    assert pair.lst.shape == (64, 64)
    assert pair.ndvi.shape == (256, 256)
    assert 250 < pair.lst.mean() < 330
    assert 32600 < pair.utm_epsg < 32800
    assert pair.granule_gt[1] > 0 and pair.granule_gt[5] < 0


@needs_data
def test_evaluate_pair_bicubic_metrics_in_published_regime():
    pair = load_test_pair(f"{DATA}/0_data_dict.pkl")
    metrics = evaluate_pair(pair, f"{DATA}/0_aster_250m.tif", bicubic_sr(pair.lst))
    assert metrics is not None
    assert set(metrics) == set(METRIC_COLUMNS)
    # sane physical regime (reference notebook: RMSE ~2 K, PSNR ~20 dB)
    assert 0.5 < metrics["RMSE"] < 5.0
    assert 12 < metrics["PSNR"] < 30
    assert 0.1 < metrics["SSIM"] < 0.9
    assert metrics["RMSE (low grad per image)"] <= metrics["RMSE (high grad per image)"]


@needs_data
def test_evaluate_pair_crops_layout():
    pair = load_test_pair(f"{DATA}/0_data_dict.pkl")
    result = evaluate_pair(
        pair, f"{DATA}/0_aster_250m.tif", bicubic_sr(pair.lst), return_crops=True
    )
    assert result is not None
    metrics, crops = result
    # reference dict layout incl. its 'LST:' key typo (compare_methods.py:642)
    assert set(crops) == {"LST:", "NDVI", "LST_ASTER", "LST_SR"}
    shapes = {v.shape for v in crops.values()}
    assert len(shapes) == 1  # all co-registered to the same crop
    assert crops["LST_SR"].shape[0] > 40


def test_compute_pair_metrics_perfect_prediction(rng):
    img = (290 + 5 * rng.random((128, 128))).astype(np.float64)
    m = compute_pair_metrics(img.copy(), img)
    assert m["RMSE"] == 0.0
    assert m["RMSE_grad"] == 0.0
    assert abs(m["SSIM"] - 1.0) < 1e-9
    assert np.isinf(m["PSNR"]) or m["PSNR"] > 100
