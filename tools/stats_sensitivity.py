"""Quantify the missing-statistics.json gap (VERDICT round-1 item 10).

The reference repo ships no statistics.json (data_preparation.py would have
produced it from the training split); our ASTER evaluation normalises with
test-set-derived statistics (data/statistics_testset.json). This sweep
perturbs mean_lst (+-1/2 K) and std_lst (x0.8..x1.25) through the full
evaluation harness for SIF-NN-SR1 and reports pair-0 and full-set means, so
the residual deltas vs the reference notebook's cell-18 numbers (PSNR 22.25 /
SSIM 0.69 / RMSE 1.95) rest on data rather than attribution.

    python tools/stats_sensitivity.py [--limit N] [--out results/stats_sensitivity.csv]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="/root/reference/test_data_formatted")
    ap.add_argument("--model-dir", default="weights/modelB_1009")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--out", default="results/stats_sensitivity.csv")
    args = ap.parse_args()

    import pandas as pd

    from sifsr_tpu.cli.model_perf import make_sr_fn
    from sifsr_tpu.eval.harness import run_evaluation

    base = json.load(open("data/statistics_testset.json"))

    rows = []
    sweeps = [("mean", dm, 1.0) for dm in (-2.0, -1.0, 0.0, 1.0, 2.0)] + [
        ("std", 0.0, fs) for fs in (0.8, 0.9, 1.1, 1.25)
    ]
    for kind, dmean, fstd in sweeps:
        stats = dict(base)
        stats["mean_lst"] = base["mean_lst"] + dmean
        stats["std_lst"] = base["std_lst"] * fstd
        tmp = "/tmp/stats_sweep.json"
        json.dump(stats, open(tmp, "w"))
        sr_fn = make_sr_fn("modelB", args.model_dir, tmp)
        df = run_evaluation(args.dataset, sr_fn, limit=args.limit,
                            log_fn=lambda *_: None)
        pair0 = df.iloc[0]
        mean = df.loc["mean"]
        rows.append({
            "kind": kind, "d_mean_lst_K": dmean, "std_scale": fstd,
            "pair0_PSNR": pair0["PSNR"], "pair0_SSIM": pair0["SSIM"],
            "pair0_RMSE": pair0["RMSE"],
            "mean_PSNR": mean["PSNR"], "mean_SSIM": mean["SSIM"],
            "mean_RMSE": mean["RMSE"],
        })
        print(rows[-1], flush=True)

    out = pd.DataFrame(rows)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    out.to_csv(args.out, index=False)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
