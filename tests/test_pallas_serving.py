"""Composed Pallas int8 serving path vs the f32 model (CPU, interpret mode).

The serving contract: make_pallas_sr_step must match the f32 ModelB_2 forward
(reference model.py:608-645) within int8 quantization error on realistic
inputs. On-hardware quality evidence for the real 64->256 shapes lives in
EVAL_RESULTS.md (ASTER harness, indistinguishable from the f32 rows)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sifsr_tpu.data.statistics import Statistics
from sifsr_tpu.inference import make_sr_step
from sifsr_tpu.models.convert import load_torch_checkpoint
from sifsr_tpu.models.pallas_serving import (
    build_pallas_serving_params,
    make_pallas_sr_step,
)
from sifsr_tpu.models.unet import ModelB2

STATS = Statistics(maxi=330.0, mini=260.0, mean_lst=300.0, std_lst=8.0,
                   mean_ndvi=0.35, std_ndvi=0.2)


@pytest.mark.slow
def test_pallas_serving_quality_vs_f32(rng):
    variables = load_torch_checkpoint(
        "/root/reference/models/modelB_1009/modelB_state_dict.pt"
    )
    # 32->128 keeps the interpreter fast; the path is shape-generic
    cal_lst = (305.0 + 4.0 * rng.random((2, 32, 32))).astype(np.float32)
    cal_ndvi = (0.4 + 0.4 * rng.random((2, 128, 128))).astype(np.float32)
    params = build_pallas_serving_params(variables, cal_lst, cal_ndvi, STATS)

    model = ModelB2()
    f32_step = make_sr_step(model, STATS, compute_dtype=jnp.float32)
    pl_step = make_pallas_sr_step(STATS, interpret=True)

    lst = jnp.asarray(304.0 + 6.0 * rng.random((2, 32, 32)), jnp.float32)
    ndvi = jnp.asarray(0.3 + 0.5 * rng.random((2, 128, 128)), jnp.float32)
    a = np.asarray(f32_step(variables, lst, ndvi))
    b = np.asarray(pl_step(params, lst, ndvi))
    d = np.abs(a - b)
    assert np.sqrt((d**2).mean()) < 0.3
    assert d.max() < 1.0


@pytest.mark.slow
def test_pallas_serving_prow_mid_vs_f32(rng):
    """The round-3 full-pallas path (mid='prow': the U-Net mid chain as
    p-row kernels, pallas/conv_px) must hold the same int8 quality contract
    as the XLA-mid path, and stay close to it (both quantize the same convs
    with the same calibrated scales)."""
    variables = load_torch_checkpoint(
        "/root/reference/models/modelB_1009/modelB_state_dict.pt"
    )
    cal_lst = (305.0 + 4.0 * rng.random((2, 32, 32))).astype(np.float32)
    cal_ndvi = (0.4 + 0.4 * rng.random((2, 128, 128))).astype(np.float32)
    params = build_pallas_serving_params(variables, cal_lst, cal_ndvi, STATS)

    model = ModelB2()
    f32_step = make_sr_step(model, STATS, compute_dtype=jnp.float32)
    xla_step = make_pallas_sr_step(STATS, interpret=True, mid="xla")
    prow_step = make_pallas_sr_step(STATS, interpret=True, mid="prow")

    lst = jnp.asarray(304.0 + 6.0 * rng.random((2, 32, 32)), jnp.float32)
    ndvi = jnp.asarray(0.3 + 0.5 * rng.random((2, 128, 128)), jnp.float32)
    a = np.asarray(f32_step(variables, lst, ndvi))
    b = np.asarray(prow_step(params, lst, ndvi))
    c = np.asarray(xla_step(params, lst, ndvi))
    d = np.abs(a - b)
    assert np.sqrt((d**2).mean()) < 0.3
    assert d.max() < 1.0
    # same conv weights + same calibrated scales -> the two int8 paths
    # agree much tighter than either does with f32
    assert np.sqrt(((b - c) ** 2).mean()) < 0.1


@pytest.mark.slow
def test_predict_cli_pallas(tmp_path, rng, monkeypatch):
    """predict --pallas end-to-end on a tiny synthetic granule: tile ->
    pallas serving (interpret on CPU) -> mosaic -> georeferenced tiff."""
    from sifsr_tpu.cli.predict import main as predict_main
    from sifsr_tpu.geo.tiff import read_geotiff, write_geotiff

    lst = (300.0 + 8.0 * rng.random((128, 128))).astype(np.float32)
    ndvi = (0.1 + 0.6 * rng.random((512, 512))).astype(np.float32)
    lst_tif = str(tmp_path / "lst.tif")
    ndvi_tif = str(tmp_path / "ndvi.tif")
    write_geotiff(lst_tif, lst, geotransform=(0.0, 1000.0, 0.0, 0.0, 0.0, -1000.0))
    write_geotiff(ndvi_tif, ndvi, geotransform=(0.0, 250.0, 0.0, 0.0, 0.0, -250.0))

    monkeypatch.chdir("/root/repo")
    out_dir = str(tmp_path / "pred")
    predict_main([
        "--MOD21A1D_file_path", lst_tif,
        "--MOD09GQ_file_path", ndvi_tif,
        "--ndvi_is_precomputed",
        "--model_dir", "weights/modelB_1009",
        "--statistics", "data/statistics_testset.json",
        "--batch_size", "4",
        "--pallas",
        "--save_path", out_dir,
    ])
    pred = read_geotiff(out_dir + "/prediction.tiff")
    assert pred.array.shape == (512, 512)
    assert 280 < np.mean(pred.array) < 330


@pytest.mark.slow
def test_pallas_calib_quantile_tightens_scales(rng):
    """build_pallas_serving_params(calib_quantile=...) must produce
    uniformly tighter (or equal) input scales than the max-abs rule."""
    variables = load_torch_checkpoint(
        "/root/reference/models/modelB_1009/modelB_state_dict.pt"
    )
    cal_lst = (300.0 + 8.0 * rng.random((2, 64, 64))).astype(np.float32)
    cal_ndvi = (0.4 + 0.4 * rng.random((2, 256, 256))).astype(np.float32)
    pmax = build_pallas_serving_params(variables, cal_lst, cal_ndvi, STATS)
    pq = build_pallas_serving_params(variables, cal_lst, cal_ndvi, STATS,
                                     calib_quantile=0.999)

    def scalars(t, out, key="in_scale"):
        if isinstance(t, dict):
            for k, v in t.items():
                if k == key:
                    out.append(float(np.asarray(v).ravel()[0]))
                else:
                    scalars(v, out, key)
        return out

    a, b = scalars(pmax, []), scalars(pq, [])
    assert len(a) == len(b) > 0
    assert all(y <= x + 1e-9 for x, y in zip(a, b))
    assert any(y < x * 0.999 for x, y in zip(a, b))
