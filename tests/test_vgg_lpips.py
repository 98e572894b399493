"""VGG16/LPIPS scaffold: architecture shapes, converter mapping, gating."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sifsr_tpu.eval.lpips import LPIPS
from sifsr_tpu.models.vgg import LPIPS_LAYERS, VGG16Features, convert_torchvision_vgg16


def test_vgg_tap_shapes():
    model = VGG16Features()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    taps = model.apply(variables, jnp.zeros((2, 64, 64, 3)))
    assert set(taps) == set(LPIPS_LAYERS)
    assert taps["relu1_2"].shape == (2, 64, 64, 64)
    assert taps["relu2_2"].shape == (2, 32, 32, 128)
    assert taps["relu3_3"].shape == (2, 16, 16, 256)
    assert taps["relu4_3"].shape == (2, 8, 8, 512)
    assert taps["relu5_3"].shape == (2, 4, 4, 512)


def test_converter_maps_torchvision_layout(rng):
    # synthetic torchvision-layout state dict (features.N.weight OIHW)
    cfg = [(0, 64, 3), (2, 64, 64), (5, 128, 64), (7, 128, 128),
           (10, 256, 128), (12, 256, 256), (14, 256, 256),
           (17, 512, 256), (19, 512, 512), (21, 512, 512),
           (24, 512, 512), (26, 512, 512), (28, 512, 512)]
    sd = {}
    for idx, out_c, in_c in cfg:
        sd[f"features.{idx}.weight"] = rng.normal(size=(out_c, in_c, 3, 3)).astype(np.float32)
        sd[f"features.{idx}.bias"] = rng.normal(size=(out_c,)).astype(np.float32)
    params = convert_torchvision_vgg16(sd)

    model = VGG16Features()
    init = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    got = jax.tree.map(lambda a: a.shape, params["params"])
    want = jax.tree.map(lambda a: a.shape, dict(init["params"]))
    assert got == want

    taps = model.apply(params, jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32))
    for layer in LPIPS_LAYERS:
        assert np.isfinite(np.asarray(taps[layer])).all()


def test_lpips_gates_cleanly_without_weights(tmp_path):
    metric = LPIPS(str(tmp_path / "no.pt"), str(tmp_path / "nope.pt"))
    assert not metric.available
    assert np.isnan(metric(np.zeros((32, 32)), np.ones((32, 32))))


def _build_torch_vgg16_features():
    """torchvision-layout VGG16 ``features`` Sequential (13 convs, 5 pools).

    Mirrors the module the reference's piq LPIPS runs (lpips.py:196-201 builds
    ``vgg16(pretrained=True).features``); indices follow VGG16_LAYERS
    (lpips.py:98-131): relu1_2=3, relu2_2=8, relu3_3=15, relu4_3=22, relu5_3=29.
    """
    import torch.nn as nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_c = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_c, v, 3, padding=1))
            layers.append(nn.ReLU())
            in_c = v
    return nn.Sequential(*layers)


def _torch_lpips_reference(model, layer_weights, x, y):
    """Direct torch transcription of piq ContentLoss with the reference's
    config (lpips.py:243-292 + model_perf_aster_formatds.py:134):
    distance='mse', reduction='mean', mean=[0,0,0], std=[1,1,1],
    normalize_features=True, LPIPS tap layers."""
    import torch

    tap_idx = {3, 8, 15, 22, 29}

    def feats(z):
        out, cur = [], z
        for i, m in enumerate(model):
            cur = m(cur)
            if i in tap_idx:
                norm = torch.sqrt(torch.sum(cur**2, dim=1, keepdim=True))
                out.append(cur / (norm + 1e-10))
        return out

    with torch.no_grad():
        xf, yf = feats(x), feats(y)
        dists = [(a - b) ** 2 for a, b in zip(xf, yf)]
        loss = torch.cat(
            [(d * w).mean(dim=[2, 3]) for d, w in zip(dists, layer_weights)], dim=1
        ).sum(dim=1)
        return float(loss.mean())


def test_lpips_random_weight_parity_vs_torch(tmp_path, rng):
    """End-to-end offline parity: random VGG16 weights + random LPIPS layer
    weights through (a) our converter + flax trunk + jax distance and (b) a
    direct torch replica of the piq math. Proves the whole chain executes and
    agrees, so only the *values* of the real weights remain an external input."""
    torch = pytest.importorskip("torch")

    model = _build_torch_vgg16_features()
    # small-magnitude weights keep 13-layer activations in a sane range
    with torch.no_grad():
        g = torch.Generator().manual_seed(7)
        for m in model:
            if isinstance(m, torch.nn.Conv2d):
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.05)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.01)
    model.eval()

    chans = (64, 128, 256, 512, 512)
    layer_weights = [
        torch.rand((1, c, 1, 1), generator=torch.Generator().manual_seed(c))
        for c in chans
    ]

    vgg_path = tmp_path / "vgg16_features.pt"
    lp_path = tmp_path / "lpips_weights.pt"
    # features-only key layout ("N.weight"); the converter must accept it
    torch.save(model.state_dict(), vgg_path)
    torch.save(layer_weights, lp_path)

    a2d = rng.random((64, 64)).astype(np.float32)
    b2d = rng.random((64, 64)).astype(np.float32)
    xa = torch.tensor(a2d).repeat(1, 3, 1, 1)  # (1,3,H,W) like model_perf:407-408
    xb = torch.tensor(b2d).repeat(1, 3, 1, 1)
    want = _torch_lpips_reference(model, layer_weights, xa, xb)

    metric = LPIPS(str(vgg_path), str(lp_path))
    assert metric.available
    got = metric(a2d, b2d)

    assert np.isfinite(got) and got > 0
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-6)

    # identical inputs -> exactly zero distance
    assert metric(a2d, a2d) == pytest.approx(0.0, abs=1e-9)


@pytest.mark.slow
def test_model_perf_cli_fills_lpips_column(tmp_path, rng):
    """VERDICT r2 item 6: the --vgg16-weights/--lpips-weights plumbing of
    cli/model_perf, driven end-to-end on real test pairs with synthetic
    weight files — the LPIPS column must fill and aggregate (the only
    remaining gap for real LPIPS numbers is the pretrained weight artifact
    itself, which is egress-gated; see EVAL_RESULTS.md)."""
    import pandas as pd
    import torch

    from sifsr_tpu.cli.model_perf import main as mp_main

    model = _build_torch_vgg16_features()
    with torch.no_grad():  # small-magnitude weights keep activations sane
        for p in model.parameters():
            p.mul_(0.05)
    chans = (64, 128, 256, 512, 512)
    layer_weights = [
        torch.rand((1, c, 1, 1), generator=torch.Generator().manual_seed(c))
        for c in chans
    ]
    vgg_path = tmp_path / "vgg16_features.pt"
    lp_path = tmp_path / "lpips_weights.pt"
    torch.save(model.state_dict(), vgg_path)
    torch.save(layer_weights, lp_path)

    out = tmp_path / "out"
    mp_main([
        "--sr-type", "bicubic",
        "--dataset", "/root/reference/test_data_formatted",
        "--statistics", "data/statistics_testset.json",
        "--limit", "2",
        "--vgg16-weights", str(vgg_path),
        "--lpips-weights", str(lp_path),
        "--out", str(out),
    ])
    df = pd.read_csv(out / "performances.csv", index_col=0)
    pair_rows = df.drop(index=["mean", "std", "10%", "Q1", "mediane", "Q3", "90%"],
                        errors="ignore")
    assert len(pair_rows) == 2
    assert np.isfinite(pair_rows["LPIPS"]).all()
    assert (pair_rows["LPIPS"] > 0).all()
    assert np.isfinite(df.loc["mean", "LPIPS"])
