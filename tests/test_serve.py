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


def test_drain_grace_window_and_order(tmp_path):
    """_drain skips files younger than the grace window (half-written
    producers) and processes the backlog oldest-first by mtime."""
    import time
    from sifsr_tpu.cli.serve import _drain

    class StubServer:
        def __init__(self):
            self.seen = []

        def process(self, job, default_out):
            self.seen.append(job["id"])
            return default_out

    watch = tmp_path / "spool"
    watch.mkdir()
    # reverse-lexicographic names, forward mtimes: mtime must win
    for i, name in enumerate(["z_first.json", "m_second.json", "a_third.json"]):
        p = watch / name
        p.write_text(json.dumps({"id": name.split("_")[0]}))
        os.utime(p, (1000.0 + i, 1000.0 + i))
    fresh = watch / "fresh.json"
    fresh.write_text(json.dumps({"id": "fresh"}))  # now-mtime: inside grace

    server = StubServer()
    n = _drain(server, str(watch), lambda *a: None, grace=30.0)
    assert server.seen == ["z", "m", "a"]
    assert n == 3
    assert fresh.exists()  # left for the next poll

    # stop check halts between jobs
    for i, name in enumerate(["j1.json", "j2.json"]):
        p = watch / name
        p.write_text(json.dumps({"id": name}))
        os.utime(p, (2000.0 + i, 2000.0 + i))
    server2 = StubServer()
    calls = {"n": 0}

    def stop_after_one():
        calls["n"] += 1
        return calls["n"] > 1

    _drain(server2, str(watch), lambda *a: None, should_stop=stop_after_one,
           grace=30.0)
    assert server2.seen == ["j1.json"]


def test_drain_survives_bad_input_and_vanished_job(tmp_path):
    """Per-job isolation holds for library-level input errors (ValueError
    from the loaders — a 3-band NDVI tif used to raise SystemExit and kill
    the daemon) AND when the failure-isolation move itself races a second
    consumer that removed the job file."""
    import json as _json
    from sifsr_tpu.cli.serve import _drain

    watch = tmp_path / "spool"
    watch.mkdir()
    for i, name in enumerate(["a_bad.json", "b_vanishes.json", "c_good.json"]):
        p = watch / name
        p.write_text(_json.dumps({"id": name.split("_")[0]}))
        os.utime(p, (1000.0 + i, 1000.0 + i))

    class StubServer:
        def __init__(self):
            self.seen = []

        def process(self, job, default_out):
            self.seen.append(job["id"])
            if job["id"] == "a":
                raise ValueError("3-band tif: expected exactly 2 bands")
            if job["id"] == "b":
                os.unlink(watch / "b_vanishes.json")  # racing consumer
                raise RuntimeError("boom")
            return default_out

    logs = []
    server = StubServer()
    n = _drain(server, str(watch), lambda m: logs.append(m), grace=30.0)
    assert server.seen == ["a", "b", "c"]  # nothing killed the drain
    assert n == 3
    # a: isolated normally
    assert (watch / "failed" / "a_bad.json").exists()
    assert "2 bands" in (watch / "failed" / "a_bad.err").read_text()
    # b: isolation move failed, logged as a skip, daemon lives on
    assert any("could not be spooled" in m for m in logs)
    # c: processed after both failures
    assert (watch / "done" / "c_good.json").exists()
