"""LPIPS perceptual distance (reference lpips.py:140-359 semantics).

Pipeline (matching the reference's piq-vendored ContentLoss with
distance='mse', mean=[0,0,0], std=[1,1,1], as called at
model_perf_aster_formatds.py:134,405-410):

1. inputs are [0,1]-rescaled single-channel crops replicated to 3 channels;
2. VGG16 features at relu1_2..relu5_3;
3. unit-normalise each feature vector along channels (eps 1e-10);
4. per-layer 1x1 "LPIPS weights" convolution (non-negative learned weights);
5. MSE distance per layer, mean over space, weighted sum over layers,
   mean over batch.

Weights are offline inputs (no egress here): ``vgg16_path`` a torch VGG16
state_dict, ``lpips_weights_path`` a torch file with the 5 per-layer weight
vectors (the piq release asset). Without them ``available`` is False and
``__call__`` returns NaN so downstream CSVs carry an explicit gap, not a
silently-wrong number.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from sifsr_tpu.models.vgg import LPIPS_LAYERS, VGG16Features, convert_torchvision_vgg16

__all__ = ["LPIPS"]

_DEFAULT_WEIGHT_DIR = os.environ.get("SIFSR_WEIGHTS_DIR", "weights")


class LPIPS:
    def __init__(
        self,
        vgg16_path: str | None = None,
        lpips_weights_path: str | None = None,
        replicate_gray: bool = True,
    ):
        vgg16_path = vgg16_path or os.path.join(_DEFAULT_WEIGHT_DIR, "vgg16_features.pt")
        lpips_weights_path = lpips_weights_path or os.path.join(
            _DEFAULT_WEIGHT_DIR, "lpips_weights.pt"
        )
        self.replicate_gray = replicate_gray
        self.available = os.path.exists(vgg16_path) and os.path.exists(lpips_weights_path)
        if not self.available:
            return

        import torch

        vgg_sd = torch.load(vgg16_path, map_location="cpu", weights_only=True)
        self._vgg_params = convert_torchvision_vgg16(
            {k: v.numpy() for k, v in vgg_sd.items()}
        )
        lp = torch.load(lpips_weights_path, map_location="cpu", weights_only=True)
        if isinstance(lp, dict):
            lp = list(lp.values())
        self._layer_weights = [np.asarray(w).reshape(-1).astype(np.float32) for w in lp]
        self._model = VGG16Features()
        self._fn = jax.jit(self._distance)

    def _distance(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        taps_a = self._model.apply(self._vgg_params, a)
        taps_b = self._model.apply(self._vgg_params, b)
        total = 0.0
        for layer, w in zip(LPIPS_LAYERS, self._layer_weights):
            fa, fb = taps_a[layer], taps_b[layer]
            # piq normalises as x / (||x|| + eps), NOT x / sqrt(||x||²+eps)
            # (reference lpips.py:281-292)
            fa = fa / (jnp.sqrt(jnp.sum(fa * fa, axis=-1, keepdims=True)) + 1e-10)
            fb = fb / (jnp.sqrt(jnp.sum(fb * fb, axis=-1, keepdims=True)) + 1e-10)
            sq = jnp.square(fa - fb) * jnp.asarray(w)[None, None, None, :]
            total = total + jnp.mean(jnp.sum(sq, axis=-1), axis=(1, 2))
        return jnp.mean(total)

    def __call__(self, pred: np.ndarray, target: np.ndarray) -> float:
        """LPIPS between two (H, W) images already rescaled to [0, 1]."""
        if not self.available:
            return float("nan")
        a = jnp.asarray(pred, jnp.float32)[None, :, :, None]
        b = jnp.asarray(target, jnp.float32)[None, :, :, None]
        if self.replicate_gray:
            a = jnp.tile(a, (1, 1, 1, 3))
            b = jnp.tile(b, (1, 1, 1, 3))
        return float(self._fn(a, b))
