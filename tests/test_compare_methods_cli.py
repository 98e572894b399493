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


def _make_results7(tmp_path, rng, n_pairs=2):
    """Synthetic dict_pred trees for all 7 reference methods."""
    from sifsr_tpu.cli.compare_methods import MODELS7

    results = tmp_path / "results"
    for idx in range(n_pairs):
        yy, xx = np.meshgrid(np.arange(96), np.arange(96), indexing="ij")
        aster = 300 + np.sin(yy / 2.5) * np.cos(xx / 3.1) + 0.2 * rng.normal(size=(96, 96))
        base = {
            "LST:": 300 + 0.5 * np.sin(yy / 2.5) * np.cos(xx / 3.1) + rng.normal() * 0.3,
            "NDVI": 0.5 + 0.1 * np.sin(xx / 4.0),
            "LST_ASTER": aster,
        }
        for k, method in enumerate(MODELS7):
            d = results / method
            d.mkdir(parents=True, exist_ok=True)
            pred = 300 + (0.5 + 0.07 * k) * np.sin(yy / 2.5) * np.cos(xx / 3.1) \
                + 0.05 * rng.normal(size=(96, 96))
            with open(d / f"{idx}_dict_pred.pkl", "wb") as f:
                pickle.dump({**base, "LST_SR": pred}, f)
    # a performances.csv for the scatter join
    perf = pd.DataFrame(
        {"PSNR": 20 + rng.random(n_pairs), "SSIM": 0.5 + 0.1 * rng.random(n_pairs),
         "RMSE": 1.5 + rng.random(n_pairs), "GSSIM": 0.3 + 0.1 * rng.random(n_pairs),
         "LPIPS": np.nan},
        index=range(n_pairs),
    )
    perf.loc["mean"] = perf.mean()
    perf.to_csv(results / "modelB_1009" / "performances.csv")
    return results


def test_figures_subcommand(tmp_path, rng):
    results = _make_results7(tmp_path, rng)
    out = tmp_path / "figs"
    cm_main(["figures", "--results-dir", str(results), "--out", str(out), "--limit", "1"])
    for stem in ("comparison", "distribution", "temperature", "frequencies_single"):
        assert (out / f"0_prediction_{stem}_tds.png").exists(), stem


def test_contrast_subcommand(tmp_path, rng):
    results = _make_results7(tmp_path, rng)
    out = tmp_path / "contrast.png"
    cm_main(["contrast", "--results-dir", str(results), "--index", "0",
             "--out", str(out)])
    assert out.exists()


def test_scatters_subcommand(tmp_path, rng):
    results = _make_results7(tmp_path, rng, n_pairs=3)
    out = tmp_path / "figs"
    cm_main(["scatters", "--results-dir", str(results), "--model", "modelB_1009",
             "--out", str(out)])
    assert (out / "modelB_1009_metrics_vs_bias_1km.png").exists()
    assert (out / "modelB_1009_metrics_vs_rmse_1km.png").exists()


def test_seasons_subcommand(tmp_path, capsys):
    rows = []
    # lowercase 'split' column + day-token directory: the real manifest
    # schema (data_preparation writes 'split'; reference dataset.py:74,192
    # reads 'split' and filters LST paths containing the time token)
    for day, split, tod in [(30, "Train", "day"), (100, "Train", "day"),
                            (200, "Train", "day"), (300, "Train", "day"),
                            (340, "Train", "day"), (100, "Val", "day"),
                            (210, "Train", "night")]:
        rows.append({
            "LST": f"data/lst_{tod}/MOD21A1D.A2020{day:03d}.h18v04.061.12.tif",
            "NDVI": f"data/ndvi/MOD09GQ.A2020{day:03d}.h18v04.061.12.tif",
            "split": split,
        })
    csv = tmp_path / "ModisDatasetB.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    out = tmp_path / "seasons.png"
    cm_main(["seasons", "--dataset-csv", str(csv), "--out", str(out)])
    assert out.exists()
    printed = capsys.readouterr().out
    # winter wraps (day 30 and 340); Val row and the night summer granule
    # (day 210) are filtered out
    assert "'Winter': 2" in printed and "'Spring': 1" in printed
    assert "'Summer': 1" in printed


def test_seasons_time_column_fallback(tmp_path, capsys):
    """Manifests whose paths carry no time token (older pipeline layouts)
    fall back to the data_preparation 'time' column (day->'D') instead of
    silently plotting an empty histogram."""
    rows = [{
        "LST": f"data/geotiff/LST/MOD21A1D.A2020{day:03d}.h18v04.061.12.tif",
        "NDVI": f"data/geotiff/NDVI/MOD09GQ.A2020{day:03d}.h18v04.061.12.tif",
        "split": "Train",
        "time": "D",
    } for day in (30, 100, 200)]
    csv = tmp_path / "ModisDatasetB.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    out = tmp_path / "seasons.png"
    cm_main(["seasons", "--dataset-csv", str(csv), "--out", str(out)])
    assert out.exists()
    printed = capsys.readouterr().out
    assert "'Winter': 1" in printed and "'Spring': 1" in printed
    assert "'Summer': 1" in printed


def test_seasons_warns_when_time_filter_empties(tmp_path, capsys):
    """No path token and no 'time' column: the empty result is loud, with a
    pointer to --time Both."""
    rows = [{
        "LST": "data/geotiff/LST/MOD21A1D.A2020100.h18v04.061.12.tif",
        "NDVI": "data/geotiff/NDVI/MOD09GQ.A2020100.h18v04.061.12.tif",
        "split": "Train",
    }]
    csv = tmp_path / "ModisDatasetB.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    out = tmp_path / "seasons.png"
    cm_main(["seasons", "--dataset-csv", str(csv), "--out", str(out)])
    captured = capsys.readouterr()
    assert "matched no rows" in captured.err
    assert "--time Both" in captured.err


def test_regression_subcommand(tmp_path, capsys, rng):
    from sifsr_tpu.data.statistics import Statistics
    from sifsr_tpu.geo.tiff import write_geotiff

    stats = Statistics(maxi=330.0, mini=260.0, mean_lst=295.0, std_lst=10.0,
                       mean_ndvi=0.3, std_ndvi=0.25)
    stats_json = tmp_path / "statistics.json"
    stats.to_json(str(stats_json))
    rows = []
    (tmp_path / "pairs").mkdir()
    for i in range(2):
        ndvi = (0.3 + 0.2 * rng.random((256, 256))).astype(np.float32)
        # anticorrelated LST so the fitted slope is decisively negative
        lst = (300.0 - 20.0 * ndvi[::4, ::4]
               + 0.05 * rng.normal(size=(64, 64))).astype(np.float32)
        lst_p = tmp_path / "pairs" / f"MOD21A1D_day.A2020{100 + i:03d}.{i}.tif"
        ndvi_p = tmp_path / "pairs" / f"MOD09GQ.A2020{100 + i:03d}.{i}.tif"
        write_geotiff(str(lst_p), lst)
        write_geotiff(str(ndvi_p), ndvi)
        rows.append({"LST": str(lst_p), "NDVI": str(ndvi_p), "split": "Train"})
    csv = tmp_path / "ModisDatasetB.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    out = tmp_path / "lst_ndvi_regression.png"
    cm_main(["regression", "--dataset-csv", str(csv),
             "--statistics", str(stats_json), "--out", str(out)])
    assert out.exists()
    printed = capsys.readouterr().out
    assert "Average Regression Parameters" in printed
    # slope mu printed and negative (LST = 300 - 20*NDVI)
    slope_line = next(l for l in printed.splitlines() if l.startswith("Slope"))
    assert "mu=-" in slope_line


def test_timediff_subcommand(tmp_path, capsys):
    # aster_modis_dataset_2.csv schema: time difference (hours) in column 9
    df = pd.DataFrame({
        **{f"c{i}": np.arange(4) for i in range(8)},
        "timediff_h": [0.25, -0.5, 0.1, 1.0],
    }, index=range(4))
    csv = tmp_path / "aster_modis_dataset_2.csv"
    df.to_csv(csv)
    cm_main(["timediff", "--test-data-csv", str(csv)])
    printed = capsys.readouterr().out
    assert "Mean: 12.8 min" in printed  # 60*(0.25-0.5+0.1+1)/4
