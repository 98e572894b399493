"""Block pooling ops (norm-L4 decimation and 2x2 average pooling).

norm-L4 pooling is the reference's physically-motivated LST decimation
(radiance-like power mean; reference utils.py:183-213): split the image into
``k x k`` blocks and return ``(mean(x^4))^(1/4)`` per block. We express it as a
reshape + reduce, which XLA fuses into a single VPU pass — no unfold needed.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["norm_l4_downsample", "avg_pool_2x2"]


def norm_l4_downsample(x: jnp.ndarray, factor: int = 4) -> jnp.ndarray:
    """Norm-L4 block pooling on (..., H, W) -> (..., H/f, W/f)."""
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // factor, factor, w // factor, factor)
    x4 = x * x
    x4 = x4 * x4
    pooled = jnp.mean(x4, axis=(-3, -1))
    return jnp.sqrt(jnp.sqrt(pooled))


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(kernel=2, stride=2) on (..., H, W) (reference model.py:504)."""
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // 2, 2, w // 2, 2)
    return jnp.mean(x, axis=(-3, -1))
