#!/usr/bin/env python3
"""Generate golden parity fixtures from the reference implementation.

Runs the *reference* torch model (imported read-only from /root/reference —
never copied) on deterministic inputs and stores inputs + outputs as .npz
fixtures under golden/. Tests then assert the JAX rebuild matches without
needing the reference tree or torch at test time.

Fixtures produced:
  golden/modelB_forward_<name>.npz   eval-mode forward passes for the three
                                     released checkpoints on random + real
                                     test-pair inputs
  golden/losses_predef.npz           reference-composition loss values
  golden/losses_gradftm.npz          (SIF-NN-SR1/SR2 recipes) on fixed inputs
  golden/train_step_predef.npz       one full torch train step (Adam, lr 1e-3):
                                     loss and the parameter/buffer state after
                                     the update, for train-parity testing

Usage:  python tools/make_golden.py
"""

import os
import pickle
import sys

import numpy as np
import torch
import torch.nn.functional as F

REFERENCE = "/root/reference"
GOLDEN = os.path.join(os.path.dirname(__file__), os.pardir, "golden")
CHECKPOINTS = {
    "modelB_1009": "SIF-NN-SR1 (predef filters)",
    "modelB_2609": "SIF-NN-SR2 (gradFTM)",
    "modelB_2011": "SC-Unet (scale invariance)",
}

sys.path.insert(0, REFERENCE)
from model import ModelB_2  # noqa: E402  (reference torch model, read-only import)


def build_model():
    return ModelB_2(
        in_channels=2,
        downchannels=[16, 32, 64, 128],
        padding_mode="replicate",
        activation="ReLU",
        bilinear=1,
        n_bridge_blocks=1,
    )


class StubUnpickler(pickle.Unpickler):
    """Unpickle the test_data_formatted dicts without rasterio installed."""

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            class Stub:
                def __init__(self, *a, **k):
                    pass

                def __setstate__(self, state):
                    self.state = state

            Stub.__qualname__ = name
            return Stub


def real_pair_input():
    """Test pair 0's (LST, NDVI), normalised with its own patch statistics
    (statistics.json is not shipped in the reference; forward parity only
    needs both frameworks to see the same input)."""
    with open(os.path.join(REFERENCE, "test_data_formatted/data/0_data_dict.pkl"), "rb") as f:
        d = StubUnpickler(f).load()
    lst = d["LST"].astype(np.float32)
    ndvi = d["NDVI"].astype(np.float32)
    lst = (lst - lst.mean()) / lst.std()
    ndvi = (ndvi - ndvi.mean()) / ndvi.std()
    import cv2

    lst_up = cv2.resize(lst, dsize=(256, 256), interpolation=cv2.INTER_CUBIC)
    return np.stack([lst_up, ndvi])[None]  # (1, 2, 256, 256) NCHW


def forward_fixtures():
    rng = np.random.default_rng(1234)
    rand_input = rng.normal(size=(4, 2, 256, 256)).astype(np.float32)
    real_input = real_pair_input()
    for name in CHECKPOINTS:
        sd_path = os.path.join(REFERENCE, "models", name, "modelB_state_dict.pt")
        model = build_model()
        model.load_state_dict(torch.load(sd_path, map_location="cpu", weights_only=True))
        model.eval()
        with torch.inference_mode():
            out_rand = model(torch.from_numpy(rand_input)).numpy()
            out_real = model(torch.from_numpy(real_input)).numpy()
        np.savez(
            os.path.join(GOLDEN, f"modelB_forward_{name}.npz"),
            rand_input=rand_input,
            rand_output=out_rand,
            real_input=real_input,
            real_output=out_real,
        )
        print(f"wrote modelB_forward_{name}.npz  ({CHECKPOINTS[name]})")


def _psf_kernel(res, mtf_res, mtf_fc, hkw=None):
    import math

    fc = 0.5 / mtf_res
    sigma = math.sqrt(-math.log(mtf_fc) / 2) / (math.pi * fc)
    if hkw is None:
        hkw = int(math.ceil(mtf_res / res))
    ii, jj = np.meshgrid(np.arange(-hkw, hkw + 1), np.arange(-hkw, hkw + 1), indexing="ij")
    dist = res * np.sqrt(ii**2 + jj**2)
    k = np.exp(-(dist**2) / (2 * sigma**2))
    return torch.tensor((k / k.sum()).astype(np.float32))


def _downscale(x, factor=4, mtf=0.1, deci="bic"):
    k = _psf_kernel(1.0, factor, mtf)
    hw = (k.shape[-1] - 1) // 2
    x = F.pad(x, (hw, hw, hw, hw), mode="reflect")
    x = F.conv2d(x, k[None, None].expand(x.shape[1], -1, -1, -1), groups=x.shape[1], padding="same")
    if deci == "bic":
        x = F.interpolate(x, scale_factor=1 / factor, mode="bicubic")
        s = int(hw / factor)
        return x[:, :, s : x.shape[-2] - s, s : x.shape[-1] - s]
    x = x[:, :, hw:-hw, hw:-hw]
    x = x.unfold(3, 4, 4).unfold(2, 4, 4)
    return torch.pow(torch.sum(torch.pow(x, 4), dim=(-1, -2)) / 16.0, 0.25)


def _lowpass(x, factor=4, mtf=0.25):
    k = _psf_kernel(1.0, factor, mtf)
    hw = (k.shape[-1] - 1) // 2
    x = F.pad(x, (hw, hw, hw, hw), mode="reflect")
    x = F.conv2d(x, k[None, None].expand(x.shape[1], -1, -1, -1), groups=x.shape[1], padding="same")
    return x[:, :, hw:-hw, hw:-hw]


SOBEL = torch.tensor(
    np.asarray(
        [
            [[1, 2, 1], [0, 0, 0], [-1, -2, -1]],
            [[1, 0, -1], [2, 0, -2], [1, 0, -1]],
            [[2, 1, 0], [1, 0, -1], [0, -1, -2]],
            [[0, 1, 2], [-1, 0, 1], [-2, -1, 0]],
        ],
        dtype=np.float32,
    )[:, None]
)

MEAN_LST, STD_LST = 295.0, 10.0  # fixed synthetic stats shared with the JAX side


def loss_fixtures():
    rng = np.random.default_rng(99)
    lst = torch.from_numpy(rng.normal(size=(2, 1, 64, 64)).astype(np.float32))
    sr = torch.from_numpy(rng.normal(size=(2, 1, 256, 256)).astype(np.float32))
    ndvi = torch.from_numpy(rng.normal(size=(2, 1, 256, 256)).astype(np.float32))
    huber = torch.nn.HuberLoss(reduction="mean", delta=1.0)

    sr_unnorm = sr * STD_LST + MEAN_LST
    sr_down = (_downscale(sr_unnorm) - MEAN_LST) / STD_LST
    ds_loss = huber(sr_down, lst)

    g_lst = F.conv2d(sr, SOBEL, padding="same")
    g_ndvi = F.conv2d(ndvi, SOBEL, padding="same")
    percep_predef = huber(g_lst, -0.5 * g_ndvi)
    np.savez(
        os.path.join(GOLDEN, "losses_predef.npz"),
        lst=lst.numpy(),
        sr=sr.numpy(),
        ndvi=ndvi.numpy(),
        mean_lst=MEAN_LST,
        std_lst=STD_LST,
        gamma=-0.5,
        alpha=0.99,
        ds_loss=ds_loss.item(),
        percep_loss=percep_predef.item(),
        total=(0.99 * ds_loss + 0.01 * percep_predef).item(),
    )

    hf_lst = sr - _lowpass(sr)
    hf_ndvi = ndvi - _lowpass(ndvi)
    percep_ftm = huber(hf_lst, -0.25 * hf_ndvi)
    np.savez(
        os.path.join(GOLDEN, "losses_gradftm.npz"),
        lst=lst.numpy(),
        sr=sr.numpy(),
        ndvi=ndvi.numpy(),
        mean_lst=MEAN_LST,
        std_lst=STD_LST,
        gamma=-0.25,
        alpha=0.5,
        ds_loss=ds_loss.item(),
        percep_loss=percep_ftm.item(),
        total=(0.5 * ds_loss + 0.5 * percep_ftm).item(),
    )
    print("wrote losses_predef.npz, losses_gradftm.npz")


def train_step_fixture():
    """One reference-composition train step (SIF-NN-SR1 recipe) from the
    modelB_1009 weights, recording loss and post-Adam parameters."""
    torch.manual_seed(7)
    model = build_model()
    sd = torch.load(
        os.path.join(REFERENCE, "models/modelB_1009/modelB_state_dict.pt"),
        map_location="cpu",
        weights_only=True,
    )
    model.load_state_dict(sd)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    huber = torch.nn.HuberLoss(reduction="mean", delta=1.0)

    rng = np.random.default_rng(2025)
    lst = torch.from_numpy(rng.normal(size=(4, 1, 64, 64)).astype(np.float32))
    lst_up = torch.from_numpy(rng.normal(size=(4, 1, 256, 256)).astype(np.float32))
    ndvi = torch.from_numpy(rng.normal(size=(4, 1, 256, 256)).astype(np.float32))

    opt.zero_grad()
    sr = model(torch.cat([lst_up, ndvi], dim=1))
    sr_down = (_downscale(sr * STD_LST + MEAN_LST) - MEAN_LST) / STD_LST
    ds_loss = huber(sr_down, lst)
    percep = huber(F.conv2d(sr, SOBEL, padding="same"), -0.5 * F.conv2d(ndvi, SOBEL, padding="same"))
    loss = 0.99 * ds_loss + 0.01 * percep
    loss.backward()
    opt.step()

    post = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    np.savez(
        os.path.join(GOLDEN, "train_step_predef.npz"),
        lst=lst.numpy(),
        lst_up=lst_up.numpy(),
        ndvi=ndvi.numpy(),
        loss=loss.item(),
        ds_loss=ds_loss.item(),
        percep_loss=percep.item(),
        **{f"post__{k}": v for k, v in post.items()},
    )
    print("wrote train_step_predef.npz")


if __name__ == "__main__":
    os.makedirs(GOLDEN, exist_ok=True)
    forward_fixtures()
    loss_fixtures()
    train_step_fixture()
