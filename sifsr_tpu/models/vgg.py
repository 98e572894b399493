"""VGG16 feature extractor (flax) for LPIPS.

The reference's LPIPS (lpips.py:140-359, vendored from piq) downloads a
pretrained torchvision VGG16 plus LPIPS layer weights at runtime. This
environment has no network egress and no torchvision, so the weights are
*inputs*: pass paths to a torch-format VGG16 ``state_dict`` (torchvision
layout: ``features.<idx>.weight/bias``) and the converter maps them onto this
module. When no weights are available the LPIPS metric is reported as NaN and
clearly flagged (eval.lpips.LPIPS.available).

Architecture: torchvision VGG16 ``features`` (13 convs, 5 maxpools), exposing
the activations the LPIPS metric uses: relu1_2, relu2_2, relu3_3, relu4_3,
relu5_3.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["VGG16Features", "convert_torchvision_vgg16"]

# (name, out_channels, torchvision features index)
_CFG = [
    ("conv1_1", 64, 0), ("conv1_2", 64, 2), ("pool", None, None),
    ("conv2_1", 128, 5), ("conv2_2", 128, 7), ("pool", None, None),
    ("conv3_1", 256, 10), ("conv3_2", 256, 12), ("conv3_3", 256, 14), ("pool", None, None),
    ("conv4_1", 512, 17), ("conv4_2", 512, 19), ("conv4_3", 512, 21), ("pool", None, None),
    ("conv5_1", 512, 24), ("conv5_2", 512, 26), ("conv5_3", 512, 28),
]

LPIPS_LAYERS = ("relu1_2", "relu2_2", "relu3_3", "relu4_3", "relu5_3")
_TAP_AFTER = {"conv1_2": "relu1_2", "conv2_2": "relu2_2", "conv3_3": "relu3_3",
              "conv4_3": "relu4_3", "conv5_3": "relu5_3"}


class VGG16Features(nn.Module):
    """NHWC VGG16 feature trunk returning the 5 LPIPS tap activations."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict:
        taps = {}
        for name, ch, _ in _CFG:
            if name == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(ch, (3, 3), padding="SAME", name=name,
                        precision=lax.Precision.HIGHEST)(x)
            x = nn.relu(x)
            if name in _TAP_AFTER:
                taps[_TAP_AFTER[name]] = x
        return taps


def convert_torchvision_vgg16(state_dict: dict) -> dict:
    """torchvision VGG16 state_dict -> flax params.

    Accepts either the full-model key layout (``features.N.weight/bias``) or a
    features-only ``Sequential`` state_dict (``N.weight/bias``), since users may
    save ``vgg16().state_dict()`` or ``vgg16().features.state_dict()``.
    """
    prefix = "features." if any(k.startswith("features.") for k in state_dict) else ""
    params = {}
    for name, _, idx in _CFG:
        if idx is None:
            continue
        w = np.asarray(state_dict[f"{prefix}{idx}.weight"])  # OIHW
        b = np.asarray(state_dict[f"{prefix}{idx}.bias"])
        params[name] = {
            "kernel": w.transpose(2, 3, 1, 0).astype(np.float32),
            "bias": b.astype(np.float32),
        }
    return {"params": params}
