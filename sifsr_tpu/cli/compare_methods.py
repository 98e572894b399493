"""Cross-method spectral analysis CLI (compare_methods.py:275-583 rebuilt).

    python -m sifsr_tpu.cli.compare_methods --dataset ./test_data_formatted \
        --models modelB_1009 TsHARP ATPRK

Consumes the per-pair {idx}_dict_pred.pkl crops written by
``model_perf --save-pairs`` (reference layout, incl. the 'LST:' key typo the
reference's own figure code depends on, compare_methods.py:642). Per pair and
method: radially-averaged Fourier attenuation spectrum; frequency-restitution
scores PFR/AFR/FRR/FRO/FRU against ASTER (truth) and bicubic (floor); the
scores are appended to each method's performances.csv (reference
compare_methods.py:336-418) and an average-spectrum figure is produced
(:420-583).

The bicubic results directory must exist — it provides both the ASTER crops
and the restitution floor.
"""

from __future__ import annotations

import glob
import os
import pickle
from argparse import ArgumentParser

import numpy as np

import jax.numpy as jnp

from sifsr_tpu.eval.spectra import afr, attenuation_spectrum_np, frr, fro, fru, pfr


def _load(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def main(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="./test_data_formatted")
    parser.add_argument("--models", nargs="+", required=True,
                        help="results subdirectories to score (bicubic is implicit)")
    parser.add_argument("--figure", default=None, help="average-spectrum PNG path")
    parser.add_argument("--results-dir", default=None,
                        help="override <dataset>/results as the results root")
    args = parser.parse_args(argv)

    results_dir = args.results_dir or os.path.join(args.dataset, "results")
    bicubic_pkls = sorted(glob.glob(os.path.join(results_dir, "bicubic", "*_dict_pred.pkl")))
    if not bicubic_pkls:
        parser.error(f"no bicubic dict_pred pkls under {results_dir}/bicubic "
                     "(run model_perf --sr-type bicubic --save-pairs first)")

    scores = {m: {k: [] for k in ("PFR", "AFR", "FRR", "FRO", "FRU")} for m in args.models}
    spectra_acc: dict[str, list] = {m: [] for m in ["ASTER", "bicubic", *args.models]}

    for bic_path in bicubic_pkls:
        idx = os.path.basename(bic_path).split("_")[0]
        bic = _load(bic_path)
        aster_db = attenuation_spectrum_np(bic["LST_ASTER"])
        bic_db = attenuation_spectrum_np(bic["LST_SR"])
        spectra_acc["ASTER"].append(aster_db)
        spectra_acc["bicubic"].append(bic_db)

        for model in args.models:
            path = os.path.join(results_dir, model, f"{idx}_dict_pred.pkl")
            if not os.path.exists(path):
                continue
            crop = _load(path)["LST_SR"]
            if crop.shape != bic["LST_SR"].shape:
                continue
            model_db = attenuation_spectrum_np(crop)
            spectra_acc[model].append(model_db)
            pb, rb, xb = jnp.asarray(model_db), jnp.asarray(aster_db), jnp.asarray(bic_db)
            scores[model]["PFR"].append(float(pfr(rb, xb)))
            scores[model]["AFR"].append(float(afr(pb, rb, xb)))
            scores[model]["FRR"].append(float(frr(pb, rb, xb)))
            scores[model]["FRO"].append(float(fro(pb, rb, xb)))
            scores[model]["FRU"].append(float(fru(pb, rb, xb)))

    import pandas as pd

    for model in args.models:
        perf_path = os.path.join(results_dir, model, "performances.csv")
        summary = {k: (float(np.mean(v)), float(np.std(v))) for k, v in scores[model].items() if v}
        print(f"{model}: " + "  ".join(f"{k}={m:.3f}±{s:.3f}" for k, (m, s) in summary.items()))
        if os.path.exists(perf_path) and scores[model]["FRR"]:
            df = pd.read_csv(perf_path, index_col=0)
            for k, v in scores[model].items():
                col = np.full(len(df), np.nan)
                col[: len(v)] = v
                df[k] = col
                df.loc["mean", k] = np.mean(v)
                df.loc["std", k] = np.std(v)
            df.to_csv(perf_path)
            print(f"  appended spectral scores to {perf_path}")

    if args.figure:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(10, 7))
        # interpolate every spectrum onto a common normalised-frequency grid
        # before averaging (compare_methods.py:492-524)
        grid = np.linspace(0, 1, 128)
        for name, specs in spectra_acc.items():
            if not specs:
                continue
            interp = [np.interp(grid, np.linspace(0, 1, len(s)), s) for s in specs]
            plt.plot(grid, np.mean(interp, axis=0), label=name)
        plt.xlabel("normalised spatial frequency")
        plt.ylabel("attenuation (dB re f0)")
        plt.legend()
        plt.savefig(args.figure, bbox_inches="tight")
        print(f"wrote {args.figure}")


if __name__ == "__main__":
    main()
