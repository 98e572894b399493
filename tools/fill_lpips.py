#!/usr/bin/env python3
"""Fill the LPIPS column of every committed performances.csv once the
pretrained weights appear offline.

The reference computes LPIPS per test pair with piq's downloaded VGG16 +
lpips layer weights (reference lpips.py:348-358, used at
model_perf_aster_formatds.py:134,405-410). This environment has no egress,
so every committed results/<model>/performances.csv carries NaN in that
column. The LPIPS port itself (eval/lpips.py + models/vgg.py) is complete
and random-weight-verified against torch (tests/test_vgg_lpips.py); the only
missing inputs are two files:

  weights/vgg16_features.pt   — torchvision VGG16 `features` state_dict
                                (torchvision.models.vgg16(weights='IMAGENET1K_V1')
                                 .features.state_dict(), ~56 MB)
  weights/lpips_weights.pt    — the 5 piq LPIPS layer-weight tensors, saved
                                as a list [w_relu1_2, w_relu2_2, w_relu3_3,
                                w_relu4_3, w_relu5_3] (piq downloads them
                                from its github release; reference
                                lpips.py:348-358)

When those exist, this tool re-runs the SR + crop pipeline for each
committed results directory (same config that produced it — see MANIFEST)
and rewrites ONLY the LPIPS column (per-pair values + the aggregate
mean/std/quantile rows), leaving every other committed number untouched.

Usage:
  python tools/fill_lpips.py                 # fill all committed CSVs
  python tools/fill_lpips.py --only modelB_1009 bicubic
  python tools/fill_lpips.py --dry-run       # self-test on random-weight
                                             # fixtures + 2 pairs, writes
                                             # nothing outside a temp dir
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TESTSET_STATS = "data/statistics_testset.json"
OWN_STATS = "data/real_corpus/statistics.json"

# results/<dir> -> the cli.model_perf configuration that produced it
# (EVAL_RESULTS.md records each command; crop mode is the default erosion
# everywhere). Keys missing here (README.md, figures, train_demo,
# stats_sensitivity.csv...) are not harness CSVs.
MANIFEST = {
    "bicubic": dict(sr_type="bicubic", statistics=TESTSET_STATS),
    "TsHARP": dict(sr_type="TsHARP", statistics=TESTSET_STATS),
    "ATPRK": dict(sr_type="ATPRK", statistics=TESTSET_STATS),
    "AATPRK": dict(sr_type="AATPRK", statistics=TESTSET_STATS),
    "DMS": dict(sr_type="DMS", statistics=TESTSET_STATS),
    "modelB_1009": dict(model_dir="weights/modelB_1009", statistics=TESTSET_STATS),
    "modelB_2609": dict(model_dir="weights/modelB_2609", statistics=TESTSET_STATS),
    "modelB_2011": dict(model_dir="weights/modelB_2011", statistics=TESTSET_STATS,
                        scale_invariance=True),
    "modelB_1009_bf16": dict(model_dir="weights/modelB_1009",
                             statistics=TESTSET_STATS, serving="bf16"),
    "modelB_1009_bf16_fusedpad": dict(model_dir="weights/modelB_1009",
                                      statistics=TESTSET_STATS, serving="bf16"),
    "modelB_1009_int8": dict(model_dir="weights/modelB_1009",
                             statistics=TESTSET_STATS, serving="int8"),
    "modelB_1009_pallas": dict(model_dir="weights/modelB_1009",
                               statistics=TESTSET_STATS, serving="pallas"),
    "modelB_1009_pallas_prow": dict(model_dir="weights/modelB_1009",
                                    statistics=TESTSET_STATS, serving="prow"),
    "modelB_2609_prow": dict(model_dir="weights/modelB_2609",
                             statistics=TESTSET_STATS, serving="prow"),
    "modelB_own": dict(model_dir="models/modelB_own", statistics=OWN_STATS),
    "modelB_own_gradftm": dict(model_dir="models/modelB_own_gradftm",
                               statistics=OWN_STATS),
    "modelB_own_scinv": dict(model_dir="models/modelB_own_scinv",
                             statistics=OWN_STATS, scale_invariance=True),
}

AGG_ROWS = ("mean", "std", "10%", "Q1", "mediane", "Q3", "90%")


def compute_lpips_column(cfg: dict, dataset: str, lpips, limit=None) -> dict:
    """Per-pair LPIPS for one results configuration: rebuild its sr_fn, run
    SR + reference crop geometry per pair, score LPIPS only."""
    import pandas as pd

    from sifsr_tpu.cli.model_perf import make_sr_fn
    from sifsr_tpu.eval.harness import evaluate_pair, load_test_pair

    sr_fn = make_sr_fn(
        cfg.get("sr_type", "modelB"),
        cfg.get("model_dir", "weights/modelB_1009"),
        cfg["statistics"],
        scale_invariance=cfg.get("scale_invariance", False),
        serving=cfg.get("serving", "f32"),
        dataset=dataset,
    )
    manifest = pd.read_csv(os.path.join(dataset, "dataset.csv"))
    out = {}
    count = 0
    for _, row in manifest.iterrows():
        idx = row.iloc[0]
        aster = os.path.join(dataset, "data", os.path.basename(row["Aster 250m UTM"]))
        pair = load_test_pair(
            os.path.join(dataset, "data", os.path.basename(row["MODIS patch"])))
        if pair.ndvi.shape != (256, 256):
            continue
        result = evaluate_pair(pair, aster, sr_fn(pair.lst, pair.ndvi), lpips)
        if result is None:
            continue
        out[idx] = result["LPIPS"]
        count += 1
        if limit and count >= limit:
            break
    return out


def merge_lpips(csv_path: str, values: dict, write: bool = True):
    """Replace the LPIPS column of a committed performances.csv with the
    recomputed per-pair values and refresh its aggregate rows; every other
    column is byte-preserved by pandas round-trip."""
    import pandas as pd

    df = pd.read_csv(csv_path, index_col=0)
    base = df.drop(index=[r for r in AGG_ROWS if r in df.index])
    filled = 0
    for idx in base.index:
        key = type(next(iter(values)))(idx) if values else idx
        if key in values:
            df.loc[idx, "LPIPS"] = values[key]
            filled += 1
    col = pd.to_numeric(
        df.drop(index=[r for r in AGG_ROWS if r in df.index])["LPIPS"],
        errors="coerce")
    df.loc["mean", "LPIPS"] = col.mean()
    df.loc["std", "LPIPS"] = col.std()
    df.loc["10%", "LPIPS"] = col.quantile(0.1)
    df.loc["Q1", "LPIPS"] = col.quantile(0.25)
    df.loc["mediane", "LPIPS"] = col.quantile(0.5)
    df.loc["Q3", "LPIPS"] = col.quantile(0.75)
    df.loc["90%", "LPIPS"] = col.quantile(0.9)
    if write:
        df.to_csv(csv_path)
    return df, filled


def make_random_fixtures(out_dir: str, seed: int = 0):
    """Random-weight VGG16/LPIPS fixture files in the exact format the real
    downloads use (the same construction as tests/test_vgg_lpips.py) — lets
    --dry-run exercise the full fill pipeline offline."""
    import torch
    from torch import nn

    torch.manual_seed(seed)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_ch, v, 3, padding=1), nn.ReLU(inplace=True)]
            in_ch = v
    features = nn.Sequential(*layers)
    os.makedirs(out_dir, exist_ok=True)
    torch.save(features.state_dict(), os.path.join(out_dir, "vgg16_features.pt"))
    widths = [64, 128, 256, 512, 512]
    torch.save([torch.rand(w) for w in widths],
               os.path.join(out_dir, "lpips_weights.pt"))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--results", default=os.path.join(REPO, "results"))
    default_ds = os.path.join(REPO, "test_data_formatted")
    if not os.path.exists(default_ds):
        default_ds = "/root/reference/test_data_formatted"
    ap.add_argument("--dataset", default=default_ds)
    ap.add_argument("--weights-dir", default=os.path.join(REPO, "weights"))
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of results dirs to fill")
    ap.add_argument("--dry-run", action="store_true",
                    help="self-test: random-weight fixtures, 2 pairs, one "
                         "cheap config, all writes to a temp dir")
    args = ap.parse_args(argv)

    from sifsr_tpu.eval.lpips import LPIPS

    if args.dry_run:
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp(prefix="fill_lpips_dryrun_")
        try:
            make_random_fixtures(tmp)
            lpips = LPIPS(os.path.join(tmp, "vgg16_features.pt"),
                          os.path.join(tmp, "lpips_weights.pt"))
            assert lpips.available, "fixture weights failed to load"
            vals = compute_lpips_column(
                MANIFEST["bicubic"], args.dataset, lpips, limit=2)
            assert vals and all(np.isfinite(v) for v in vals.values()), vals
            src = os.path.join(args.results, "bicubic", "performances.csv")
            dst = os.path.join(tmp, "performances.csv")
            shutil.copy(src, dst)
            df, filled = merge_lpips(dst, vals)
            assert filled == len(vals), (filled, len(vals))
            assert np.isfinite(df.loc["mean", "LPIPS"])
            print(f"dry-run OK: {len(vals)} pairs scored "
                  f"(e.g. {sorted(vals.items())[0]}), merged CSV aggregates "
                  f"finite; nothing written outside {tmp}")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return 0

    lpips = LPIPS()  # default weights/ locations
    if not lpips.available:
        print(
            "LPIPS weights not found. Place these two files then re-run:\n"
            f"  {args.weights_dir}/vgg16_features.pt  "
            "(torchvision vgg16 IMAGENET1K_V1 .features.state_dict())\n"
            f"  {args.weights_dir}/lpips_weights.pt   "
            "(list of the 5 piq lpips layer-weight tensors)\n"
            "See tools/fill_lpips.py docstring / README 'LPIPS' for details.")
        return 1
    names = args.only or sorted(MANIFEST)
    for name in names:
        csv_path = os.path.join(args.results, name, "performances.csv")
        if name not in MANIFEST or not os.path.exists(csv_path):
            print(f"skip {name}: no manifest entry or CSV")
            continue
        print(f"filling {name} ...")
        vals = compute_lpips_column(MANIFEST[name], args.dataset, lpips)
        _, filled = merge_lpips(csv_path, vals)
        print(f"  {filled} pairs filled -> {csv_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
