#!/usr/bin/env python3
"""Build a real-data training corpus from the reference's test_data_formatted
pairs (the 83 ASTER-paired MODIS patches).

The SIF training recipes are self-supervised — the losses need only the
(LST 1 km, NDVI 250 m) pair, no high-resolution ground truth (reference
train_model_B_predef_filters.py:100-133) — so the real test pairs double as a
real *training* corpus: each pkl carries exactly the LST 64x64 Kelvin patch
and the NDVI 256x256 patch the reference's own dataset pipeline would produce
(reference model_perf_aster_formatds.py:145-178 reads the same keys).

Output layout mirrors what process_modis + find_corresponding_NDVI emit
(reference process_modis.py:214-335): per-pair GeoTIFFs + a pairs CSV that
cli.data_preparation consumes to produce the split manifest + statistics.json.

    python tools/make_real_corpus.py --out data/real_corpus
    python -m sifsr_tpu.cli.data_preparation \
        --pairs data/real_corpus/pairs_day.csv \
        --out data/real_corpus/ModisDatasetB.csv \
        --statistics-out data/real_corpus/statistics.json
"""

from __future__ import annotations

import csv
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sifsr_tpu.eval.harness import load_test_pair  # noqa: E402
from sifsr_tpu.geo.tiff import write_geotiff  # noqa: E402


def main(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="/root/reference/test_data_formatted")
    parser.add_argument("--out", default="data/real_corpus")
    args = parser.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    rows = []
    with open(os.path.join(args.dataset, "dataset.csv"), newline="") as f:
        reader = csv.reader(f)
        next(reader)  # header
        for row in reader:
            idx = row[0]
            pkl_rel = row[2].lstrip("./")
            rows.append((idx, os.path.join(args.dataset, os.path.basename(os.path.dirname(pkl_rel)), os.path.basename(pkl_rel))))

    out_rows = []
    for idx, pkl_path in rows:
        pair = load_test_pair(pkl_path)
        # the pair's geotransform is at SR (250 m) resolution over the NDVI
        # window; the LST geotransform is the same origin at 4x pixel size —
        # only used for georeference bookkeeping, not by training numerics
        gt = pair.granule_gt
        gt_lst = (gt[0], gt[1] * 4, gt[2], gt[3], gt[4], gt[5] * 4)
        lst_path = os.path.join(args.out, f"{idx}_MOD21A1D_day_LST.tif")
        ndvi_path = os.path.join(args.out, f"{idx}_MOD09GQ_day_NDVI.tif")
        write_geotiff(lst_path, pair.lst.astype("float32"), geotransform=gt_lst)
        write_geotiff(ndvi_path, pair.ndvi.astype("float32"), geotransform=gt)
        out_rows.append((idx, lst_path, ndvi_path))

    pairs_csv = os.path.join(args.out, "pairs_day.csv")
    with open(pairs_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["", "index", "LST", "NDVI"])
        for i, (idx, lst_path, ndvi_path) in enumerate(out_rows):
            w.writerow([i, idx, lst_path, ndvi_path])
    print(f"wrote {len(out_rows)} pairs under {args.out} + {pairs_csv}")


if __name__ == "__main__":
    main()
