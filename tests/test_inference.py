"""Tiled granule inference: tiling round-trips, coverage, overlapped blending."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sifsr_tpu.data.statistics import Statistics
from sifsr_tpu.inference import predict_granule, tile_granule, untile_mosaic
from sifsr_tpu.models.unet import ModelB2

STATS = Statistics(maxi=330.0, mini=260.0, mean_lst=295.0, std_lst=10.0,
                   mean_ndvi=0.3, std_ndvi=0.25)


@pytest.fixture(scope="module")
def tiny_setup():
    model = ModelB2(downchannels=(8, 16, 32, 64))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 2)), train=False)
    return model, variables


def test_tile_untile_roundtrip(rng):
    lst = rng.normal(size=(192, 192)).astype(np.float32)
    ndvi = rng.normal(size=(768, 768)).astype(np.float32)
    lst_b, ndvi_b, grid = tile_granule(lst, ndvi)
    assert lst_b.shape == (9, 64, 64)
    assert ndvi_b.shape == (9, 256, 256)
    np.testing.assert_array_equal(untile_mosaic(ndvi_b, grid), ndvi)


@pytest.mark.slow
def test_predict_granule_shapes_and_coverage(rng, tiny_setup):
    model, variables = tiny_setup
    lst = (300 + 5 * rng.random((128, 128))).astype(np.float32)
    lst[:64, :64] = 0.0  # a fully invalid block
    ndvi = (rng.random((512, 512)) * 0.8).astype(np.float32)

    out = predict_granule(variables, lst, ndvi, STATS, model=model,
                          batch_size=4, coverage=0.05, compute_dtype=jnp.float32)
    assert out.shape == (512, 512)
    assert np.all(out[:256, :256] == 0.0)         # masked block
    assert np.all(out[256:, 256:] != 0.0)         # valid block predicted


@pytest.mark.slow
def test_overlapped_blending_reduces_seams(rng, tiny_setup):
    model, variables = tiny_setup
    # smooth field -> SR output should be smooth; measure the seam jump at
    # the block boundary with and without overlap
    yy, xx = np.meshgrid(np.arange(128), np.arange(128), indexing="ij")
    lst = (300 + 5 * np.sin(yy / 17.0) * np.cos(xx / 23.0)).astype(np.float32)
    ndvi = (0.5 + 0.2 * np.sin(np.arange(512) / 37.0))[None, :].repeat(512, 0).astype(np.float32)

    hard = predict_granule(variables, lst, ndvi, STATS, model=model,
                           batch_size=9, compute_dtype=jnp.float32)
    soft = predict_granule(variables, lst, ndvi, STATS, model=model,
                           batch_size=9, compute_dtype=jnp.float32, overlap=16)
    assert soft.shape == hard.shape

    # seam discontinuity across the fine-block boundary at row 256
    seam_hard = np.abs(hard[256] - hard[255]).mean()
    seam_soft = np.abs(soft[256] - soft[255]).mean()
    assert seam_soft <= seam_hard + 1e-6
    # interiors agree (blending is a weighted average of valid predictions)
    interior = np.s_[64:192, 64:192]
    assert np.abs(soft[interior] - hard[interior]).mean() < 2.0


@pytest.mark.slow
def test_predict_granule_sharded_matches_single(rng, tiny_setup):
    """Mesh-sharded granule SR equals the single-device result (tiles are
    independent; SPMD is semantics-preserving)."""
    from sifsr_tpu.parallel.mesh import make_mesh

    model, variables = tiny_setup
    lst = (300 + 5 * rng.random((128, 128))).astype(np.float32)
    ndvi = (rng.random((512, 512)) * 0.8).astype(np.float32)

    single = predict_granule(variables, lst, ndvi, STATS, model=model,
                             batch_size=4, compute_dtype=jnp.float32)
    sharded = predict_granule(variables, lst, ndvi, STATS, model=model,
                              batch_size=4, compute_dtype=jnp.float32,
                              mesh=make_mesh(4))
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-4)


@pytest.mark.slow
def test_predict_granule_device_tiling_matches_host(rng, tiny_setup):
    """The all-on-device tiling path (one upload, one download) returns the
    same mosaic as the host double-buffered pipeline, including coverage
    zeroing and a tail batch (5 tiles, batch_size 2)."""
    model, variables = tiny_setup
    lst = (300 + 5 * rng.random((128, 192))).astype(np.float32)
    lst[:64, :64] = 0.0
    ndvi = (rng.random((512, 768)) * 0.8).astype(np.float32)

    kw = dict(stats=STATS, model=model, batch_size=2, coverage=0.5,
              compute_dtype=jnp.float32)
    host = predict_granule(variables, lst, ndvi, **kw)
    dev = predict_granule(variables, lst, ndvi, device_tiling=True, **kw)
    assert dev.shape == host.shape == (512, 768)
    np.testing.assert_allclose(dev, host, atol=1e-4)


def test_load_ndvi_two_band_file(tmp_path, rng):
    """predict accepts one chunky 2-band MOD09GQ tif (Red, NIR band order)."""
    import numpy as np
    from sifsr_tpu.cli.predict import _load_ndvi
    from tests.test_geo_tiff import _build_multiband_tiff

    red = (0.05 + 0.2 * rng.random((16, 16))).astype(np.float32)
    nir = (0.2 + 0.5 * rng.random((16, 16))).astype(np.float32)
    p = str(tmp_path / "mod09gq.tif")
    with open(p, "wb") as f:
        f.write(_build_multiband_tiff(np.stack([red, nir], axis=-1)))
    ndvi, gt = _load_ndvi(p, None, False)
    np.testing.assert_allclose(ndvi, (nir - red) / (nir + red), rtol=1e-5)

    # single-band without --red_file_path: clear library-level error
    # (ValueError, not SystemExit — the serve daemon must be able to
    # isolate it per job; the predict CLI converts it to a clean exit)
    import pytest
    q = str(tmp_path / "nir_only.tif")
    from sifsr_tpu.geo.tiff import write_geotiff
    write_geotiff(q, nir)
    with pytest.raises(ValueError, match="red_file_path"):
        _load_ndvi(q, None, False)


def test_load_single_band_consumers_reject_multiband(tmp_path, rng):
    """Multi-band TIFFs read as (H, W, S) (geo/tiff.py); consumers that
    require a single band must reject them with a clear error instead of
    mis-shaping the tiling downstream."""
    import numpy as np
    import pytest
    from sifsr_tpu.cli.predict import _load_lst, _load_ndvi
    from tests.test_geo_tiff import _build_multiband_tiff

    p = str(tmp_path / "mb.tif")
    with open(p, "wb") as f:
        f.write(_build_multiband_tiff(
            rng.random((8, 8, 2)).astype(np.float32)))
    with pytest.raises(ValueError, match="single-band"):
        _load_lst(p)
    with pytest.raises(ValueError, match="single-band"):
        _load_ndvi(p, None, True)  # precomputed NDVI must be one band


@pytest.mark.slow
def test_predict_granule_wire_int_matches_f32(rng, tiny_setup):
    """wire='int' (uint16 LST / int16 NDVI up, uint16 Kelvin/0.02 down —
    half the transfer bytes) must match the f32-wire result within the
    0.01 K output rounding plus the model's response to the <=5e-5 NDVI
    encode rounding, on both the host pipeline and device tiling."""
    model, variables = tiny_setup
    lst = (300 + 5 * rng.random((128, 192))).astype(np.float32)
    lst[:64, :64] = 0.0  # invalid block must survive the wire encode
    ndvi = (rng.random((512, 768)) * 0.8).astype(np.float32)

    kw = dict(stats=STATS, model=model, batch_size=2, coverage=0.5,
              compute_dtype=jnp.float32)
    ref = predict_granule(variables, lst, ndvi, **kw)
    for mode in (dict(), dict(device_tiling=True)):
        out = predict_granule(variables, lst, ndvi, wire="int", **mode, **kw)
        assert out.shape == ref.shape and out.dtype == np.float32
        assert np.all(out[:256, :256] == 0.0)  # coverage zeroing intact
        valid = ref != 0.0
        assert np.abs(out[valid] - ref[valid]).max() < 0.05

    # MODIS-native inputs (already on the 0.02 K / 1e-4 grids) encode
    # losslessly: only the output rounding remains
    lst_q = np.round(lst / 0.02) * 0.02
    ndvi_q = np.round(ndvi / 1e-4).astype(np.float32) * 1e-4
    ref_q = predict_granule(variables, lst_q, ndvi_q, **kw)
    out_q = predict_granule(variables, lst_q, ndvi_q, wire="int", **kw)
    valid = ref_q != 0.0
    # half an output LSB (0.01 K) plus f32-representation noise on the grid
    assert np.abs(out_q[valid] - ref_q[valid]).max() <= 0.011


def test_choose_granule_mode_link_regimes():
    """The auto-mode decision model picks the overlapped host pipeline on a
    bandwidth-bound link (this harness's tunnel: ~20 MB/s, ms-scale rtt) and
    device_tiling on a dispatch-latency-bound link (a real PCIe host:
    ~10 GB/s, where two bulk transfers beat 2*n_batches dispatch round
    trips) — the two regimes measured in FUTURE.md's round-4 breakdown."""
    from sifsr_tpu.inference import choose_granule_mode

    tunnel = dict(rtt_s=5e-3, h2d_bytes_per_s=20e6, d2h_bytes_per_s=20e6)
    pcie = dict(rtt_s=5e-3, h2d_bytes_per_s=10e9, d2h_bytes_per_s=10e9)
    d_tunnel = choose_granule_mode((1200, 1200), 64, 4, 108, link=tunnel)
    d_pcie = choose_granule_mode((1200, 1200), 64, 4, 108, link=pcie)
    assert d_tunnel["mode"] == "host_pipeline"
    assert d_pcie["mode"] == "device_tiling"
    # the predicted walls must order consistently with the decision
    assert d_tunnel["t_host_pipeline_s"] < d_tunnel["t_device_tiling_s"]
    assert d_pcie["t_device_tiling_s"] < d_pcie["t_host_pipeline_s"]


def test_choose_granule_mode_burst_probe_tie_break():
    """Regression (round 5): a probe that catches the tunnel's BURST rate
    (~100 MB/s vs ~27 sustained) predicted a ~5% device_tiling win and
    measured a 15% loss. Near-tie predictions must fall back to the
    gracefully-degrading host pipeline; only a decisive (>25%) predicted
    win selects device_tiling."""
    from sifsr_tpu.inference import choose_granule_mode

    burst = dict(rtt_s=27.5e-3, h2d_bytes_per_s=100.4e6,
                 d2h_bytes_per_s=38.2e6)          # the r5 bench probe
    d = choose_granule_mode((1200, 1200), 64, 4, 108, link=burst)
    assert d["mode"] == "host_pipeline"
    # prediction really is a near-tie on this probe — the margin decides
    assert d["t_device_tiling_s"] < d["t_host_pipeline_s"]


@pytest.mark.slow
def test_predict_granule_mode_auto_matches_fixed(rng, tiny_setup, monkeypatch):
    """mode='auto' must produce the same mosaic as whichever fixed mode it
    picks (the probe only selects a path, never changes numerics)."""
    import sifsr_tpu.inference as inf

    model, variables = tiny_setup
    lst = (300 + 5 * rng.random((128, 128))).astype(np.float32)
    ndvi = (rng.random((512, 512)) * 0.8).astype(np.float32)
    kw = dict(stats=STATS, model=model, batch_size=4,
              compute_dtype=jnp.float32)

    # pin the probe so the test is deterministic (no real link measurement)
    monkeypatch.setattr(inf, "probe_link",
                        lambda **_: dict(rtt_s=5e-3, h2d_bytes_per_s=10e9,
                                         d2h_bytes_per_s=10e9))
    auto = predict_granule(variables, lst, ndvi, mode="auto", **kw)
    fixed = predict_granule(variables, lst, ndvi, mode="device_tiling", **kw)
    np.testing.assert_allclose(auto, fixed, atol=1e-5)

    with pytest.raises(ValueError):
        predict_granule(variables, lst, ndvi, mode="bogus", **kw)


# ---------------------------------------------------------------------------
# Stub-step plumbing tests: predict_granule's tiling/coverage/wire/mode logic
# exercised with a trivial x4 'SR' step (jnp.repeat) instead of the U-Net —
# compiles in milliseconds, so these stay in the core (non-slow) suite while
# the end-to-end tiny-model parity tests above carry the `slow` mark.
def _stub_step(params, lst_b, ndvi_b):
    return jnp.repeat(jnp.repeat(lst_b, 4, axis=1), 4, axis=2)


def _stub_kw():
    return dict(stats=STATS, sr_step=_stub_step, step_params=None,
                batch_size=4)


def test_stub_granule_modes_agree(rng):
    lst = (300 + 5 * rng.random((192, 192))).astype(np.float32)
    lst[:64, 64:128] = 0.0
    ndvi = (rng.random((768, 768)) * 0.8).astype(np.float32)
    kw = _stub_kw()
    host = predict_granule(None, lst, ndvi, coverage=0.05, **kw)
    dev = predict_granule(None, lst, ndvi, coverage=0.05,
                          mode="device_tiling", **kw)
    assert host.shape == (768, 768)
    np.testing.assert_allclose(host, dev, atol=1e-5)
    assert np.all(host[:256, 256:512] == 0.0)  # masked invalid block


def test_stub_granule_wire_int_roundtrip(rng):
    """wire='int' quantises to the MODIS-native steps; for data already on
    those steps the mosaic must be exact."""
    lst = np.round((300 + 5 * rng.random((128, 128))) / 0.02) * 0.02
    lst = lst.astype(np.float32)
    ndvi = (np.round(rng.random((512, 512)) * 8000) * 1e-4).astype(np.float32)
    kw = _stub_kw()
    ref = predict_granule(None, lst, ndvi, **kw)
    for mode in ({}, {"device_tiling": True}):
        out = predict_granule(None, lst, ndvi, wire="int", **mode, **kw)
        np.testing.assert_allclose(out, ref, atol=1e-3)


def test_stub_overlap_blending_preserves_constants(rng):
    """The trapezoid taper must be a partition of unity wherever tiles
    overlap: a constant granule comes back constant."""
    lst = np.full((192, 192), 305.0, np.float32)
    ndvi = np.full((768, 768), 0.4, np.float32)
    out = predict_granule(None, lst, ndvi, overlap=16, **_stub_kw())
    np.testing.assert_allclose(out, 305.0, atol=1e-3)


def test_stub_mode_auto_equals_picked_fixed_mode(rng, monkeypatch):
    import sifsr_tpu.inference as inf

    lst = (300 + 5 * rng.random((128, 128))).astype(np.float32)
    ndvi = (rng.random((512, 512)) * 0.8).astype(np.float32)
    kw = _stub_kw()
    # auto must equal whichever fixed mode its decision picks (the decision
    # REGIMES are asserted on a full-size granule in
    # test_choose_granule_mode_link_regimes; a 2x2-block granule is
    # legitimately pipeline-favoured on any link — one batch, no dispatch
    # amortisation for device_tiling to win back)
    for link in (dict(rtt_s=5e-3, h2d_bytes_per_s=10e9, d2h_bytes_per_s=10e9),
                 dict(rtt_s=5e-3, h2d_bytes_per_s=20e6, d2h_bytes_per_s=20e6)):
        monkeypatch.setattr(inf, "probe_link", lambda **_: link)
        decision = inf.choose_granule_mode(lst.shape, 64, 4, 4)
        auto = predict_granule(None, lst, ndvi, mode="auto", **kw)
        fixed = predict_granule(None, lst, ndvi, mode=decision["mode"], **kw)
        np.testing.assert_allclose(auto, fixed, atol=1e-5)
