"""Bicubic upsampling baseline (the evaluation's floor method)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from sifsr_tpu.ops.resize import upsample_bicubic


def bicubic_sr(lst_coarse: np.ndarray, factor: int = 4) -> np.ndarray:
    """cv2-convention bicubic x4 of a coarse LST patch
    (model_perf_aster_formatds.py:179)."""
    return np.asarray(upsample_bicubic(jnp.asarray(lst_coarse, jnp.float32), factor))
