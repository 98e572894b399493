"""compare_methods CLI end-to-end on synthetic dict_pred fixtures."""

import os
import pickle

import numpy as np
import pandas as pd

from sifsr_tpu.cli.compare_methods import main as cm_main


def test_compare_methods_end_to_end(tmp_path, rng):
    results = tmp_path / "results"
    for method in ("bicubic", "mymodel"):
        (results / method).mkdir(parents=True)
    # two pairs: ASTER has high-freq detail; bicubic = smoothed; model = closer
    for idx in (0, 1):
        yy, xx = np.meshgrid(np.arange(96), np.arange(96), indexing="ij")
        aster = 300 + np.sin(yy / 2.5) * np.cos(xx / 3.1) + 0.2 * rng.normal(size=(96, 96))
        smooth = 300 + 0.5 * np.sin(yy / 2.5) * np.cos(xx / 3.1)
        model = 300 + 0.9 * np.sin(yy / 2.5) * np.cos(xx / 3.1) + 0.1 * rng.normal(size=(96, 96))
        base = {"LST:": smooth, "NDVI": np.zeros((96, 96))}
        with open(results / "bicubic" / f"{idx}_dict_pred.pkl", "wb") as f:
            pickle.dump({**base, "LST_ASTER": aster, "LST_SR": smooth}, f)
        with open(results / "mymodel" / f"{idx}_dict_pred.pkl", "wb") as f:
            pickle.dump({**base, "LST_ASTER": aster, "LST_SR": model}, f)

    perf = pd.DataFrame({"PSNR": [20.0, 21.0]}, index=[0, 1])
    perf.loc["mean"] = perf.mean()
    perf.loc["std"] = perf.std()
    perf.to_csv(results / "mymodel" / "performances.csv")

    fig = str(tmp_path / "spectrum.png")
    cm_main(["--results-dir", str(results), "--models", "mymodel", "--figure", fig])

    df = pd.read_csv(results / "mymodel" / "performances.csv", index_col=0)
    assert "FRR" in df.columns
    # the model restores most of the frequency content the smoothed floor lost
    assert 0.3 < float(df.loc["mean", "FRR"]) <= 1.5
    assert os.path.exists(fig)
