"""bilinear=False (ConvTranspose decoder) parity vs a torch composition."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from sifsr_tpu.models import ModelB2
from sifsr_tpu.models.convert import convert_torch_state_dict
import pytest


def _torch_convtranspose_upblock(x, w, b):
    return torch.nn.functional.conv_transpose2d(x, w, b, stride=2)


def test_convtranspose_upsample_parity(rng):
    """flax ConvTranspose(k=2, s=2) with converted torch weights must match
    torch's ConvTranspose2d (the reference's non-bilinear branch,
    model.py:212)."""
    import flax.linen as nn

    c_in, c_out = 8, 4
    w = rng.normal(size=(c_in, c_out, 2, 2)).astype(np.float32)
    b = rng.normal(size=(c_out,)).astype(np.float32)
    x = rng.normal(size=(1, c_in, 5, 5)).astype(np.float32)

    with torch.no_grad():
        want = _torch_convtranspose_upblock(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)
        ).numpy()

    from sifsr_tpu.models.convert import convert_torch_state_dict

    tree = convert_torch_state_dict(
        {"ub1.up.weight": torch.from_numpy(w), "ub1.up.bias": torch.from_numpy(b)}
    )
    mod = nn.ConvTranspose(c_out, (2, 2), strides=(2, 2), padding="VALID")
    params = {
        "kernel": jnp.asarray(tree["params"]["ub1"]["up"]["kernel"]),
        "bias": jnp.asarray(tree["params"]["ub1"]["up"]["bias"]),
    }
    got = mod.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_modelb2_convtranspose_config_runs(rng):
    """The bilinear=False configuration builds with the reference's channel
    arithmetic (upfactor=1: db3 emits the full 128) and runs forward."""
    model = ModelB2(bilinear=False, downchannels=(8, 16, 32, 64))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 2)), train=False)
    # db3 emits downchannels[3] (no halving) in the ConvTranspose config
    assert variables["params"]["db3"]["lastconv"]["kernel"].shape[-1] == 64
    assert "up" in variables["params"]["ub1"]
    out = model.apply(variables, jnp.zeros((2, 64, 64, 2)), train=False)
    assert out.shape == (2, 64, 64, 1)


def test_converter_maps_convtranspose_keys(rng):
    sd = {
        "ub1.up.weight": torch.from_numpy(rng.normal(size=(64, 32, 2, 2)).astype(np.float32)),
        "ub1.up.bias": torch.from_numpy(rng.normal(size=(32,)).astype(np.float32)),
    }
    tree = convert_torch_state_dict(sd)
    assert tree["params"]["ub1"]["up"]["kernel"].shape == (2, 2, 64, 32)
    assert tree["params"]["ub1"]["up"]["bias"].shape == (32,)
