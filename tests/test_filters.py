"""Parity test: directional Sobel bank vs torch F.conv2d 'same'."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sifsr_tpu.ops import directional_gradients
from sifsr_tpu.ops.filters import _SOBEL_BANK


def test_directional_gradients_match_torch(rng):
    img = rng.normal(size=(2, 64, 64, 1)).astype(np.float32)
    filters_tensor = torch.from_numpy(_SOBEL_BANK[:, None])  # (4,1,3,3)
    want = F.conv2d(
        torch.from_numpy(img.transpose(0, 3, 1, 2)), filters_tensor, padding="same"
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(directional_gradients(jnp.asarray(img)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
