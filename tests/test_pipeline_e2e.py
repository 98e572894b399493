"""Full-lifecycle end-to-end test: synthetic MODIS granule (.hdf) ->
process_modis -> data_preparation -> ModisDataset -> one training epoch ->
whole-granule predict CLI -> georeferenced prediction.tiff."""

import json
import os

import numpy as np
import pytest

from sifsr_tpu.geo.hdf4 import write_hdf4_sds
from sifsr_tpu.geo.tiff import read_geotiff

STRUCT_META_LST = """GROUP=GridStructure
\tXDim=256
\tYDim=256
\tUpperLeftPointMtrs=(0.000000,5559752.598333)
\tLowerRightMtrs=(237216.110,5322536.487)
END_GROUP=GridStructure
"""
STRUCT_META_NDVI = """GROUP=GridStructure
\tXDim=1024
\tYDim=1024
\tUpperLeftPointMtrs=(0.000000,5559752.598333)
\tLowerRightMtrs=(237216.110,5322536.487)
END_GROUP=GridStructure
"""


def _make_granules(tmp_path, rng, n_days=3):
    lst_dir = tmp_path / "hdf" / "MOD21A1D.061"
    nir_dir = tmp_path / "hdf" / "MOD09GQ.061"
    lst_dir.mkdir(parents=True)
    nir_dir.mkdir(parents=True)
    for day in range(n_days):
        date = f"2017{100 + day:03d}"
        lst_dn = (rng.random((256, 256)) * 1500 + 14500).astype(np.uint16)  # ~290-320 K
        qc = np.zeros((256, 256), np.uint8)
        write_hdf4_sds(
            str(lst_dir / f"MOD21A1D.A{date}.h18v04.061.hdf"),
            {"LST_Day_1KM": lst_dn, "QC_Day": qc},
            struct_metadata=STRUCT_META_LST,
            deflate=True,
        )
        base = rng.random((1024, 1024)) * 0.3 + 0.2
        red = ((base) * 10000).astype(np.int16)
        nir = ((base + 0.3) * 10000).astype(np.int16)
        write_hdf4_sds(
            str(nir_dir / f"MOD09GQ.A{date}.h18v04.061.hdf"),
            {"sur_refl_b01_1": red, "sur_refl_b02_1": nir},
            struct_metadata=STRUCT_META_NDVI,
            deflate=True,
        )
    return str(lst_dir), str(nir_dir)


@pytest.mark.slow
def test_full_lifecycle(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    lst_dir, nir_dir = _make_granules(tmp_path, rng)

    # 1. process_modis: granules -> patch tiffs + pairs csv
    from sifsr_tpu.cli.process_modis import main as process_main

    process_main([
        "--product", "MOD21A1D",
        "--lst-dir", lst_dir,
        "--nirred-dir", nir_dir,
        "--out-lst", "data/geotiff/LST",
        "--out-ndvi", "data/geotiff/NDVI",
        "--pairs-out", "data/pairs_day.csv",
    ])
    import pandas as pd

    pairs = pd.read_csv("data/pairs_day.csv")
    assert len(pairs) == 3 * 16  # 3 days x 16 blocks, all valid

    # threaded granule workers must produce the identical manifest
    process_main([
        "--product", "MOD21A1D",
        "--lst-dir", lst_dir,
        "--nirred-dir", nir_dir,
        "--out-lst", "data/geotiff_w2/LST",
        "--out-ndvi", "data/geotiff_w2/NDVI",
        "--pairs-out", "data/pairs_day_w2.csv",
        "--workers", "2",
    ])
    pairs_w2 = pd.read_csv("data/pairs_day_w2.csv")
    assert [os.path.basename(p) for p in pairs_w2["LST"]] == \
           [os.path.basename(p) for p in pairs["LST"]]

    # 2. data_preparation: split + statistics
    from sifsr_tpu.cli.data_preparation import main as prep_main

    prep_main(["--pairs", "data/pairs_day.csv"])
    stats = json.load(open("data/statistics.json"))
    assert 285 < stats["mean_lst"] < 325
    assert set(pd.read_csv("data/ModisDatasetB.csv")["split"]) <= {"Train", "Val"}

    # 3. one tiny training run through the real CLI config path
    params = {
        "dataset_parameter": {"time": "day", "transf": "norm"},
        "hyperparameters": {"batch_size": 4, "learning_rate": 1e-3, "n_epochs": 1,
                             "patience": 5, "alpha": 0.99, "gamma": -0.5},
        "modelB_parameters": {"in_channels": 2, "downchannels": [16, 32, 64, 128],
                               "padding_mode": "replicate", "activation": "ReLU",
                               "bilinear": 1, "n_bridge_blocks": 1},
        "save_parameters": {"model_name": "modelB", "save_path": "models/e2e"},
        "device": "tpu",
    }
    with open("params.json", "w") as f:
        json.dump(params, f)
    from sifsr_tpu.cli.train import main as train_main

    train_main(["--params", "params.json", "--recipe", "predef_filters"])
    assert os.path.exists("models/e2e/modelB_variables.msgpack")
    assert os.path.exists("models/e2e/modelB_lossdata.pkl")
    assert os.path.exists("models/e2e/modelB_loss.png")

    # 4. whole-granule prediction with the trained weights (tif inputs)
    lst_granule = read_geotiff("data/geotiff/LST/" + sorted(os.listdir("data/geotiff/LST"))[0])
    # rebuild a full granule tif from the source hdf for the predict CLI
    from sifsr_tpu.geo.hdf4 import read_modis_lst, read_modis_nir_red
    from sifsr_tpu.geo.tiff import write_geotiff

    lst_full, gt_lst = read_modis_lst(
        os.path.join(lst_dir, sorted(os.listdir(lst_dir))[0]), "day"
    )
    red, nir, gt_ndvi = read_modis_nir_red(
        os.path.join(nir_dir, sorted(os.listdir(nir_dir))[0])
    )
    ndvi_full = ((nir - red) / (nir + red)).astype(np.float32)
    write_geotiff("granule_lst.tif", lst_full, geotransform=gt_lst)
    write_geotiff("granule_ndvi.tif", ndvi_full, geotransform=gt_ndvi)

    from sifsr_tpu.cli.predict import main as predict_main

    predict_main([
        "--MOD21A1D_file_path", "granule_lst.tif",
        "--MOD09GQ_file_path", "granule_ndvi.tif",
        "--ndvi_is_precomputed",
        "--model_dir", "models/e2e",
        "--statistics", "data/statistics.json",
        "--batch_size", "16",
        "--f32",
    ])
    pred = read_geotiff("predictions/prediction.tiff")
    assert pred.array.shape == (1024, 1024)
    assert pred.geotransform is not None
    # prediction should be in a physical Kelvin range near the input
    assert 270 < np.mean(pred.array) < 340
    _ = lst_granule
