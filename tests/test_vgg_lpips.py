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
