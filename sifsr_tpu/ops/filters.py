"""Fixed directional-derivative filter bank for the perceptual loss.

The SIF-NN-SR1 objective compares Sobel-family responses of the SR output and
of the NDVI guide (reference train_model_B_predef_filters.py:38-42,120-130).
The reference rebuilds the 4x1x3x3 filter tensor on every batch on the host;
here the bank is a module-level constant folded into the jitted loss graph.

torch ``F.conv2d`` computes cross-correlation with zero 'same' padding; we use
``lax.conv_general_dilated`` with identical semantics (verified in tests).
"""

from __future__ import annotations

import functools

import jax.lax as lax
import jax.numpy as jnp
import numpy as np

__all__ = ["sobel_bank", "directional_gradients"]

_SOBEL_BANK = np.asarray(
    [
        [[1, 2, 1], [0, 0, 0], [-1, -2, -1]],    # vertical gradient
        [[1, 0, -1], [2, 0, -2], [1, 0, -1]],    # horizontal gradient
        [[2, 1, 0], [1, 0, -1], [0, -1, -2]],    # main-diagonal gradient
        [[0, 1, 2], [-1, 0, 1], [-2, -1, 0]],    # anti-diagonal gradient
    ],
    dtype=np.float32,
)


@functools.lru_cache(maxsize=None)
def sobel_bank(dtype_name: str = "float32") -> np.ndarray:
    """The 4-filter bank as HWIO weights (3, 3, 1, 4) for NHWC convs."""
    return _SOBEL_BANK.transpose(1, 2, 0)[:, :, None, :].astype(dtype_name)


def directional_gradients(x: jnp.ndarray) -> jnp.ndarray:
    """Cross-correlate a single-channel NHWC batch with the 4-filter bank.

    x: (N, H, W, 1) -> (N, H, W, 4), zero 'same' padding (torch parity).
    """
    weights = jnp.asarray(sobel_bank(str(x.dtype)))
    return lax.conv_general_dilated(
        x,
        weights,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
