"""Serving-daemon spool tests: drain, output, per-job failure isolation."""

import json
import os

import numpy as np
import pytest

from sifsr_tpu.geo.tiff import read_geotiff, write_geotiff


@pytest.mark.slow
def test_serve_once_drains_spool(tmp_path, rng):
    from sifsr_tpu.cli.serve import main

    # tiny granule pair: 128x128 LST (K) + 512x512 precomputed NDVI
    lst = (290.0 + 10.0 * rng.random((128, 128))).astype(np.float32)
    ndvi = (rng.random((512, 512)) * 0.8 - 0.05).astype(np.float32)
    write_geotiff(str(tmp_path / "lst.tif"), lst,
                  geotransform=(0.0, 926.6, 0.0, 0.0, 0.0, -926.6))
    write_geotiff(str(tmp_path / "ndvi.tif"), ndvi,
                  geotransform=(0.0, 231.7, 0.0, 0.0, 0.0, -231.7))

    watch = tmp_path / "jobs"
    watch.mkdir()
    (watch / "a_good.json").write_text(json.dumps({
        "lst": str(tmp_path / "lst.tif"),
        "ndvi": str(tmp_path / "ndvi.tif"),
        "ndvi_is_precomputed": True,
        "out": str(tmp_path / "out" / "a.tiff"),
    }))
    (watch / "b_bad.json").write_text(json.dumps({
        "lst": str(tmp_path / "missing.tif"),
        "ndvi": str(tmp_path / "ndvi.tif"),
        "ndvi_is_precomputed": True,
    }))
    (watch / "c_not_json.json").write_text("{nope")

    main(["--watch", str(watch), "--f32", "--once",
          "--model_dir", "weights/modelB_1009",
          "--statistics", "data/statistics_testset.json",
          "--batch_size", "4"])

    # good job: output written, physical Kelvin range, job in done/
    out = read_geotiff(str(tmp_path / "out" / "a.tiff"))
    assert out.array.shape == (512, 512)
    assert 260.0 < np.mean(out.array[out.array != 0]) < 330.0
    assert (watch / "done" / "a_good.json").exists()
    assert not (watch / "a_good.json").exists()

    # failures isolated: moved to failed/ with .err, never crash the drain
    for stem in ("b_bad", "c_not_json"):
        assert (watch / "failed" / f"{stem}.json").exists()
        assert (watch / "failed" / f"{stem}.err").read_text().strip()
