"""Full-scale ingest stress test (VERDICT r3 item 7): a true-size
1200x1200 MOD21A1D + 4800x4800 MOD09GQ granule pair written in the
chunked+per-chunk-deflate EOS layout real NASA granules use, driven through
process_modis -> data_preparation -> a training batch -> whole-granule
predict, with wall-time and memory envelopes asserted.

This is the closest offline proxy to real-granule validation of the
spec-based HDF4 reader (geo/hdf4.py): the writer produces the SPECIAL_CHUNKED
structure from the HDF4 spec (chunk-table Vdata, per-chunk SPECIAL_COMP
elements, zero-padded edge chunks), not from the reader's parsing code.
Reference throughput anchor: process_modis.py:429-432 reports 10-20 min for
~3 years of granules, i.e. ~1 s/granule-day.
"""

import os
import resource
import time

import numpy as np
import pytest

from sifsr_tpu.geo.hdf4 import HDF4File, write_hdf4_sds

H18V04_UL = (0.0, 5559752.598333)
H18V04_LR = (1111950.519667, 4447802.078667)

STRUCT_META_LST = f"""GROUP=GridStructure
\tXDim=1200
\tYDim=1200
\tUpperLeftPointMtrs=({H18V04_UL[0]:.6f},{H18V04_UL[1]:.6f})
\tLowerRightMtrs=({H18V04_LR[0]:.6f},{H18V04_LR[1]:.6f})
END_GROUP=GridStructure
"""
STRUCT_META_NDVI = f"""GROUP=GridStructure
\tXDim=4800
\tYDim=4800
\tUpperLeftPointMtrs=({H18V04_UL[0]:.6f},{H18V04_UL[1]:.6f})
\tLowerRightMtrs=({H18V04_LR[0]:.6f},{H18V04_LR[1]:.6f})
END_GROUP=GridStructure
"""


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_chunked_writer_roundtrip_with_edge_chunks(tmp_path, rng):
    """Fast guard: the SPECIAL_CHUNKED writer (chunk size not dividing the
    dims) round-trips through the reader, incl. the fused-dtype path."""
    arr = rng.integers(13000, 16500, size=(330, 510)).astype(np.uint16)
    p = str(tmp_path / "c.hdf")
    write_hdf4_sds(p, {"LST_Day_1KM": arr}, chunks=(128, 128))
    f = HDF4File(p)
    np.testing.assert_array_equal(f.read_sds("LST_Day_1KM"), arr)
    got = f.read_sds("LST_Day_1KM", dtype=np.float32)
    np.testing.assert_array_equal(got, arr.astype(np.float32))


@pytest.mark.slow
def test_full_scale_chunked_granule_ingest(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    lst_dir = tmp_path / "hdf" / "MOD21A1D.061"
    nir_dir = tmp_path / "hdf" / "MOD09GQ.061"
    lst_dir.mkdir(parents=True)
    nir_dir.mkdir(parents=True)

    # smooth anticorrelated fields (realistic deflate ratios; random noise
    # would not compress and real granules do)
    base = np.add.outer(np.sin(np.linspace(0, 9, 4800)),
                        np.cos(np.linspace(0, 7, 4800)))
    ndvi_field = 0.45 + 0.2 * base / 2.0
    red = np.clip((ndvi_field * 0.35) * 1e4, 1, 32767).astype(np.int16)
    nir = np.clip(((ndvi_field * 0.35) * (1 + ndvi_field) / (1 - ndvi_field))
                  * 1e4, 1, 32767).astype(np.int16)
    lst_k = 300.0 - 10.0 * base[::4, ::4] / 2.0 + rng.normal(
        0, 0.3, (1200, 1200))
    lst_dn = np.clip(lst_k / 0.02, 1, 65535).astype(np.uint16)
    qc = np.zeros((1200, 1200), np.uint8)

    t0 = time.perf_counter()
    write_hdf4_sds(
        str(lst_dir / "MOD21A1D.A2017200.h18v04.061.hdf"),
        {"LST_Day_1KM": lst_dn, "QC_Day": qc},
        struct_metadata=STRUCT_META_LST, chunks=(300, 300),
    )
    write_hdf4_sds(
        str(nir_dir / "MOD09GQ.A2017200.h18v04.061.hdf"),
        {"sur_refl_b01_1": red, "sur_refl_b02_1": nir},
        struct_metadata=STRUCT_META_NDVI, chunks=(600, 600),
    )
    t_write = time.perf_counter() - t0

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    # 1. full-granule ingest: 324 patch pairs
    from sifsr_tpu.cli.process_modis import main as process_main

    t0 = time.perf_counter()
    process_main([
        "--product", "MOD21A1D",
        "--lst-dir", str(lst_dir),
        "--nirred-dir", str(nir_dir),
        "--out-lst", "data/geotiff/LST",
        "--out-ndvi", "data/geotiff/NDVI",
        "--pairs-out", "data/pairs_day.csv",
        "--workers", "2",
    ])
    t_ingest = time.perf_counter() - t0

    import pandas as pd

    pairs = pd.read_csv("data/pairs_day.csv")
    assert len(pairs) == 18 * 18
    assert os.path.exists("data/pairs_day_error.png")  # georef-QA histogram

    # 2. split + statistics
    from sifsr_tpu.cli.data_preparation import main as prep_main

    prep_main(["--pairs", "data/pairs_day.csv"])

    # 3. a training batch through the manifest dataset + device prep
    import json

    from sifsr_tpu.data.datasets import ModisDataset, prepare_batch
    from sifsr_tpu.data.statistics import Statistics

    stats = Statistics(**json.load(open("data/statistics.json")))
    ds = ModisDataset("data/ModisDatasetB.csv", stats, split="Train")
    batch = prepare_batch(next(ds.batches(8, seed=0)))
    assert batch["lst_up"].shape == (8, 256, 256, 1)
    assert np.isfinite(np.asarray(batch["lst_up"])).all()

    # 4. whole-granule predict at true 1200x1200 scale
    import jax
    import jax.numpy as jnp

    from sifsr_tpu.geo.hdf4 import read_modis_lst, read_modis_nir_red
    from sifsr_tpu.inference import predict_granule
    from sifsr_tpu.models.unet import ModelB2

    lst_full, _ = read_modis_lst(
        str(lst_dir / "MOD21A1D.A2017200.h18v04.061.hdf"), "day")
    red_r, nir_r, _ = read_modis_nir_red(
        str(nir_dir / "MOD09GQ.A2017200.h18v04.061.hdf"))
    ndvi_full = np.where(nir_r + red_r != 0,
                         (nir_r - red_r) / (nir_r + red_r + 1e-12), 0.0)
    model = ModelB2(downchannels=(4, 8, 16, 32))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 2)),
                           train=False)
    t0 = time.perf_counter()
    mosaic = predict_granule(variables, lst_full.astype(np.float32),
                             ndvi_full.astype(np.float32), stats, model=model,
                             batch_size=54, compute_dtype=jnp.float32)
    t_predict = time.perf_counter() - t0
    # 1200 is not a 64-multiple: 18x18 blocks -> 4608² mosaic (the reference
    # loop also leaves the 48-px remainder unprocessed, predict.py:84)
    assert mosaic.shape == (4608, 4608)
    assert np.isfinite(mosaic).all()

    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    rss_delta_gb = (rss1 - rss0) / 1e6  # ru_maxrss is kB on linux

    # envelopes: ingest of ONE full granule-day well under the reference's
    # ~1 s/granule-day x a wide safety factor for CI noise; peak-RSS growth
    # bounded (the whole pipeline is streaming/tiled, never materialises
    # more than a few granule-sized arrays)
    print(f"write={t_write:.1f}s ingest={t_ingest:.1f}s "
          f"predict={t_predict:.1f}s rss_delta={rss_delta_gb:.2f}GB")
    assert t_ingest < 120.0, f"full-granule ingest too slow: {t_ingest:.1f}s"
    assert rss_delta_gb < 4.0, f"peak RSS grew {rss_delta_gb:.2f} GB"
