"""Separable image resampling as precomputed matrices (TPU/MXU friendly).

The reference pipeline resamples with three distinct conventions that all must
be matched bit-for-bit for data/loss parity:

1. cv2.resize(..., INTER_CUBIC) — dataset bicubic x4 upsample
   (reference dataset.py:141 -> utils.py:163-180).
2. torch.nn.functional.interpolate(mode='bicubic', align_corners=False) —
   the 1/4 decimation inside the differentiable sensor model
   (reference utils.py:1698-1706).
3. torch.nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True) —
   the U-Net decoder upsample (reference model.py:207).

All three are *linear* maps with a fixed tap pattern, so instead of translating
the gather-based CPU implementations we precompute, per axis, a dense
``(out, in)`` resampling matrix in float64 and apply it as two batched matmuls:

    y = A_h @ x @ A_w^T        (einsum over NHWC batches)

A 256x64 matmul pair per image lands on the MXU, fuses with neighbours under
jit, and is numerically *exact* w.r.t. the composed reference operators
(same kernel, same half-pixel grid, same edge clamping).

Conventions (verified against cv2 5.x / torch 2.x in tests/test_resize.py):
- cubic kernel: Keys with A = -0.75 (both cv2 and torch use this constant);
- half-pixel mapping x_src = (i + 0.5) * in/out - 0.5 with edge-clamped taps;
- align_corners=True linear mapping x_src = i * (in-1)/(out-1).
"""

from __future__ import annotations

import functools

import jax
from jax import lax

import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize_matrix",
    "cubic_resize",
    "upsample_bicubic",
    "downsample_bicubic",
    "upsample_bilinear_x2",
    "upsample_bilinear_x2_nhwc_hp",
]

_A = -0.75  # Keys cubic coefficient used by cv2 INTER_CUBIC and torch bicubic.


def _cubic_weight(t: np.ndarray) -> np.ndarray:
    """Keys cubic kernel with A=-0.75, evaluated elementwise on |t|."""
    t = np.abs(t)
    w = np.where(
        t <= 1.0,
        ((_A + 2.0) * t - (_A + 3.0)) * t * t + 1.0,
        np.where(t < 2.0, ((_A * t - 5.0 * _A) * t + 8.0 * _A) * t - 4.0 * _A, 0.0),
    )
    return w


@functools.lru_cache(maxsize=None)
def resize_matrix(in_size: int, out_size: int, kind: str = "cubic") -> np.ndarray:
    """Dense (out_size, in_size) float64 resampling matrix for one axis.

    kind:
      'cubic'      half-pixel bicubic, A=-0.75, clamped taps (cv2/torch parity)
      'linear_ac'  bilinear with align_corners=True (torch Upsample parity)
    """
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if kind == "cubic":
        scale = in_size / out_size
        for i in range(out_size):
            x = (i + 0.5) * scale - 0.5
            ix = int(np.floor(x))
            frac = x - ix
            taps = np.arange(ix - 1, ix + 3)
            weights = _cubic_weight(taps - x)
            # cv2/torch clamp out-of-range taps to the border pixel.
            taps = np.clip(taps, 0, in_size - 1)
            np.add.at(mat[i], taps, weights)
            # Guard: weights of the Keys kernel sum to 1 analytically; keep the
            # tiny float64 residue rather than renormalising (matches torch).
        _ = frac
    elif kind == "linear_ac":
        if out_size == 1:
            mat[0, 0] = 1.0
            return mat
        scale = (in_size - 1) / (out_size - 1) if in_size > 1 else 0.0
        for i in range(out_size):
            x = i * scale
            ix = min(int(np.floor(x)), in_size - 2) if in_size > 1 else 0
            frac = x - ix
            mat[i, ix] += 1.0 - frac
            if in_size > 1:
                mat[i, ix + 1] += frac
    else:
        raise ValueError(f"unknown resize kind: {kind!r}")
    return mat


def _apply_separable(x: jnp.ndarray, mat_h: jnp.ndarray, mat_w: jnp.ndarray) -> jnp.ndarray:
    """Apply per-axis matrices to the two spatial dims of ``(..., H, W)``.

    HIGHEST precision keeps the MXU in float32 accumulation — these matrices
    sit in the data/loss parity path where bf16 rounding is not acceptable.
    """
    import jax

    y = jnp.einsum("oh,...hw->...ow", mat_h, x, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("ow,...hw->...ho", mat_w, y, precision=jax.lax.Precision.HIGHEST)
    return y


def cubic_resize(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bicubic resize of the trailing two axes to ``out_hw`` (cv2/torch parity).

    Works for any leading batch/channel dims; computation runs in float32 on
    device with float64-precomputed weights.
    """
    h, w = x.shape[-2], x.shape[-1]
    mat_h = jnp.asarray(resize_matrix(h, out_hw[0], "cubic"), dtype=x.dtype)
    mat_w = jnp.asarray(resize_matrix(w, out_hw[1], "cubic"), dtype=x.dtype)
    return _apply_separable(x, mat_h, mat_w)


def upsample_bicubic(x: jnp.ndarray, factor: int = 4) -> jnp.ndarray:
    """cv2.INTER_CUBIC x`factor` upsample (reference utils.py:163-180)."""
    h, w = x.shape[-2], x.shape[-1]
    return cubic_resize(x, (h * factor, w * factor))


def downsample_bicubic(x: jnp.ndarray, factor: int = 4) -> jnp.ndarray:
    """torch bicubic 1/`factor` decimation, antialias=False (utils.py:1698-1706)."""
    h, w = x.shape[-2], x.shape[-1]
    return cubic_resize(x, (h // factor, w // factor))


def upsample_bilinear_x2(x: jnp.ndarray) -> jnp.ndarray:
    """torch Upsample(scale_factor=2, bilinear, align_corners=True) on (..., H, W)."""
    h, w = x.shape[-2], x.shape[-1]
    mat_h = jnp.asarray(resize_matrix(h, 2 * h, "linear_ac"), dtype=x.dtype)
    mat_w = jnp.asarray(resize_matrix(w, 2 * w, "linear_ac"), dtype=x.dtype)
    return _apply_separable(x, mat_h, mat_w)


def upsample_bilinear_x2_nhwc_hp(x: jnp.ndarray) -> jnp.ndarray:
    """align_corners bilinear x2 directly on (N, H, W, C), HIGHEST-precision
    contractions — the transpose-free twin of upsample_bilinear_x2 (equal up
    to summation order; parity test in tests/test_resize.py).

    Round-5 NEGATIVE result worth keeping on record: swapping this into the
    training UpBlock (hypothesis: the profile's copy.* ops were the
    moveaxis transposes) measured 1,855 vs 1,851 samples/s at b256 bf16
    fused — XLA already folds the moveaxis transposes into the einsum
    dimension numbers, so the UpBlock keeps the original formulation for
    bit-stable history. Kept as a public API for NHWC callers (the serving
    path's models/fused.py has its own DEFAULT-precision twin)."""
    import jax

    h, w = x.shape[1], x.shape[2]
    mat_h = jnp.asarray(resize_matrix(h, 2 * h, "linear_ac"), dtype=x.dtype)
    mat_w = jnp.asarray(resize_matrix(w, 2 * w, "linear_ac"), dtype=x.dtype)
    y = jnp.einsum("oh,nhwc->nowc", mat_h, x,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("pw,nowc->nopc", mat_w, y,
                      precision=jax.lax.Precision.HIGHEST)


# --------------------------------------------------- stencil formulation

@functools.lru_cache(maxsize=None)
def _upsample_stencil(in_size: int, factor: int, kind: str):
    """Decompose an integer-factor upsample matrix into per-phase shift
    coefficients: out[f*k + d] = sum_delta C[d, delta][k] * x[k + delta].

    Every row of resize_matrix(in, f*in) has its (clamp-accumulated) support
    within a bounded window around k, so the resize is a varying-coefficient
    small-stencil filter — pure roll+fma passes on TPU, no gathers (jnp.take
    lowers to a catastrophically slow gather) and no skinny matmuls (the
    einsum form lowers through far-off-roofline dot emitters; both measured
    in round 2). Returns {(d, delta): coeff (in_size,) float32}."""
    a = resize_matrix(in_size, factor * in_size, kind)
    coeffs: dict = {}
    for o in range(factor * in_size):
        k, d = divmod(o, factor)
        for h in np.nonzero(a[o])[0]:
            key = (d, int(h) - k)
            if key not in coeffs:
                coeffs[key] = np.zeros(in_size, np.float64)
            coeffs[key][k] = a[o, h]
    return {k: v for k, v in sorted(coeffs.items())}

