#!/usr/bin/env python3
"""Single-pair evaluation walkthrough — the script equivalent of the
reference's Evaluation_of_MODIS_SuperResolution_LST.ipynb.

Loads test pair 0, runs SIF-NN-SR1 (the released modelB_1009 weights through
the JAX model), reprojects/co-registers against the ASTER 250 m scene, and
prints the notebook's metric line. Also writes the 4-panel comparison figure.

    python examples/single_pair_walkthrough.py \
        [--pair 0] [--dataset /root/reference/test_data_formatted] \
        [--model-dir /root/reference/models/modelB_1009]
"""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--pair", type=int, default=0)
    parser.add_argument("--dataset", default="/root/reference/test_data_formatted")
    parser.add_argument("--model-dir", default="/root/reference/models/modelB_1009")
    parser.add_argument("--statistics", default="data/statistics_testset.json")
    parser.add_argument("--figure", default="results/walkthrough_pair.png")
    parser.add_argument("--crop", default="erosion", choices=("erosion", "reference"),
                        help="'reference' reproduces the notebook cell-18 "
                             "anchor (PSNR 22.25 / RMSE 1.95) exactly; "
                             "'erosion' (default) excludes warp edge ramps")
    args = parser.parse_args()

    from sifsr_tpu.cli.model_perf import make_sr_fn
    from sifsr_tpu.eval.harness import evaluate_pair, load_test_pair, save_pair_figure

    pair = load_test_pair(
        os.path.join(args.dataset, "data", f"{args.pair}_data_dict.pkl")
    )
    print(f"pair {args.pair}: LST {pair.lst.shape} (mean {pair.lst.mean():.1f} K), "
          f"NDVI {pair.ndvi.shape}, UTM EPSG:{pair.utm_epsg}")

    sr_fn = make_sr_fn("modelB", args.model_dir, args.statistics)
    lst_sr = sr_fn(pair.lst, pair.ndvi)
    print(f"SR patch: {lst_sr.shape}, {lst_sr.min():.1f}..{lst_sr.max():.1f} K")

    metrics, crops = evaluate_pair(
        pair,
        os.path.join(args.dataset, "data", f"{args.pair}_aster_250m.tif"),
        lst_sr,
        return_crops=True,
        crop_mode=args.crop,
    )
    # the notebook's cell-18 printout format (its values: PSNR 22.25,
    # SSIM 0.69, RMSE 1.95, ... with the original statistics.json)
    print(
        f"PSNR: {metrics['PSNR']:.2f}  SSIM: {metrics['SSIM']:.2f}  "
        f"RMSE: {metrics['RMSE']:.2f}  RMSE<25%: {metrics['RMSE (low grad per image)']:.2f}  "
        f"RMSE>25%<75%: {metrics['RMSE (mean grad per image)']:.2f}  "
        f"RMSE>75%: {metrics['RMSE (high grad per image)']:.2f}  "
        f"GSSIM: {metrics['GSSIM']:.2f}  LPIPS: {metrics['LPIPS']:.2f}  "
        f"RMSE_gradients: {metrics['RMSE_grad']:.2f}"
    )

    os.makedirs(os.path.dirname(args.figure) or ".", exist_ok=True)
    save_pair_figure(crops, args.figure)
    print(f"figure: {args.figure}")


if __name__ == "__main__":
    main()
