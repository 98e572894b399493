"""Batched on-device harness metrics (eval.device_metrics) vs the per-pair
numpy path — the two must agree on the SAME crops (VERDICT r4 ask 4)."""

import numpy as np
import pytest

from sifsr_tpu.eval.device_metrics import (
    COLUMNS, device_metric_rows, pad_crops)
from sifsr_tpu.eval.harness import compute_pair_metrics

DATA = "/root/reference/test_data_formatted"


def _synthetic_crop_pairs(rng, shapes):
    """Kelvin-scale crops with structure (so SSIM/GSSIM aren't degenerate)."""
    pairs = []
    for h, w in shapes:
        yy, xx = np.mgrid[0:h, 0:w]
        base = 300.0 + 8.0 * np.sin(yy / 17.0) + 6.0 * np.cos(xx / 23.0)
        aster = base + rng.normal(0, 0.8, (h, w))
        sr = base + rng.normal(0, 0.8, (h, w)) + 0.4 * rng.random((h, w))
        pairs.append((sr.astype(np.float64), aster.astype(np.float64)))
    return pairs


def _assert_rows_match(pairs, rtol=2e-4, atol=2e-4):
    dev_rows = device_metric_rows(pairs)
    for (sr, aster), dev in zip(pairs, dev_rows):
        host = compute_pair_metrics(sr, aster)
        for col in COLUMNS:
            np.testing.assert_allclose(
                dev[col], host[col], rtol=rtol, atol=atol,
                err_msg=f"{col} mismatch on crop {sr.shape}")


def test_device_metrics_match_host_on_variable_shapes(rng):
    """Mixed crop shapes in one padded batch: every masked-window metric must
    equal its per-crop host value (padding must never leak into windows,
    percentiles or counts)."""
    _assert_rows_match(_synthetic_crop_pairs(
        rng, [(96, 128), (211, 97), (128, 128), (97, 211)]))


def test_device_metrics_match_host_on_real_pairs(rng):
    """Real harness crops (bicubic SR over reference test pairs) through the
    full run_evaluation device path vs the host path."""
    import pandas as pd

    from sifsr_tpu.cli.model_perf import make_sr_fn
    from sifsr_tpu.eval.harness import run_evaluation

    sr_fn = make_sr_fn("bicubic", "", "data/statistics_testset.json")
    kw = dict(limit=3, log_fn=lambda *_: None)
    df_host = run_evaluation(DATA, sr_fn, **kw)
    df_dev = run_evaluation(DATA, sr_fn, device_metrics=True, **kw)
    base_host = df_host.drop(index=["mean", "std", "10%", "Q1", "mediane", "Q3", "90%"])
    base_dev = df_dev.drop(index=["mean", "std", "10%", "Q1", "mediane", "Q3", "90%"])
    assert list(base_dev.index) == list(base_host.index)
    for col in COLUMNS:
        np.testing.assert_allclose(
            base_dev[col].to_numpy(float), base_host[col].to_numpy(float),
            rtol=2e-4, atol=2e-4, err_msg=col)
    # aggregate means too (the verdict's 1e-4 bar)
    np.testing.assert_allclose(
        df_dev.loc["mean", list(COLUMNS)].to_numpy(float),
        df_host.loc["mean", list(COLUMNS)].to_numpy(float),
        rtol=1e-4, atol=1e-4)


def test_stratified_rmse_nonzero_quirk_preserved():
    """The reference drops exact-zero squared errors from stratified RMSE
    (model_perf_aster_formatds.py:389). Force pred==target on a block and
    check both paths agree."""
    rng = np.random.default_rng(7)
    (sr, aster), = _synthetic_crop_pairs(rng, [(96, 96)])
    sr[10:30, 10:30] = aster[10:30, 10:30]  # exact-zero errors
    _assert_rows_match([(sr, aster)])


def test_pad_crops_layout():
    rng = np.random.default_rng(0)
    crops = [rng.random((5, 9)), rng.random((8, 4))]
    padded, shapes = pad_crops(crops)
    assert padded.shape == (2, 8, 9)
    np.testing.assert_array_equal(shapes, [[5, 9], [8, 4]])
    np.testing.assert_allclose(padded[0, :5, :9], crops[0], rtol=1e-6)
    assert padded[0, 5:].sum() == 0 and padded[1, :, 4:].sum() == 0
