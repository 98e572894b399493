"""Fourier-space frequency-restitution metrics (reference utils.py:598-662).

The reference builds, per radius r, two full dense circle masks and reduces
over the image — O(R·H·W) work in Python. Here the radial binning is a single
segment-sum over a precomputed ring-index map (ring r holds the pixels with
r < dist(center) <= r+1), which XLA lowers to one scatter-add — and the whole
spectrum is jittable/vmappable over batches.

Conventions preserved exactly:
- input to the radial average is fftshift(abs(fft2(image)));
- entry 0 of the spectrum is the ratio 1.0 (f0/f0), not 0 dB — reference quirk
  (utils.py:619);
- entries 1.. are 10*(log10(ring mean) - log10(f0)) for r = 0..min(center)-2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["attenuation_spectrum", "pfr", "afr", "frr", "fro", "fru"]


@functools.lru_cache(maxsize=None)
def _ring_ids(h: int, w: int) -> tuple[np.ndarray, int]:
    """Per-pixel ring index for a fftshifted (h, w) spectrum.

    Ring r (0-based) = pixels with r < dist <= r+1 from the center bin;
    the center pixel itself gets id -1 (it is the f0 reference).
    Returns (ids, n_rings) where n_rings = min(h//2, w//2) - 1 matches the
    reference's loop bound range(0, min(center) - 1).
    """
    cy, cx = h // 2, w // 2
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    dist2 = (yy - cy) ** 2 + (xx - cx) ** 2
    # ring r <=> r^2 < dist2 <= (r+1)^2  <=>  r = ceil(sqrt(dist2)) - 1
    ids = np.ceil(np.sqrt(dist2)).astype(np.int64) - 1
    ids[cy, cx] = -1
    n_rings = min(cy, cx) - 1
    ids[ids >= n_rings] = -1  # out-of-range rings are ignored, like the reference
    return ids, n_rings


def attenuation_spectrum(image: jnp.ndarray) -> jnp.ndarray:
    """Radially-averaged attenuation spectrum in dB re f0 of a 2-D image.

    Equivalent to compute_2D_attenuation_spectra(fftshift(abs(fft2(image))))
    (utils.py:598-637 + compare_methods.py:312). Returns (1 + n_rings,).
    """
    h, w = image.shape[-2], image.shape[-1]
    ids_np, n_rings = _ring_ids(h, w)
    ids = jnp.asarray(ids_np)

    spec = jnp.fft.fftshift(jnp.abs(jnp.fft.fft2(image)), axes=(-2, -1))
    f0 = spec[..., h // 2, w // 2]

    valid = ids >= 0
    seg = jnp.where(valid, ids, n_rings)  # overflow bucket for ignored pixels
    flat = spec.reshape(*spec.shape[:-2], -1)
    seg_flat = seg.reshape(-1)

    def reduce_one(s):
        sums = jax.ops.segment_sum(s, seg_flat, num_segments=n_rings + 1)[:n_rings]
        counts = jax.ops.segment_sum(
            jnp.ones_like(s), seg_flat, num_segments=n_rings + 1
        )[:n_rings]
        return sums / counts

    means = reduce_one(flat) if flat.ndim == 1 else jax.vmap(reduce_one)(flat)
    att = 10.0 * (jnp.log10(means) - jnp.log10(f0[..., None]))
    head = jnp.ones((*spec.shape[:-2], 1), dtype=att.dtype)  # f0/f0 quirk
    return jnp.concatenate([head, att], axis=-1)


# ---- frequency-restitution scores (utils.py:639-662). pb = prediction's
# spectrum, rb = ground truth (ASTER), xb = bicubic floor; all in dB.
def pfr(rb: jnp.ndarray, xb: jnp.ndarray) -> jnp.ndarray:
    """Potential frequency restitution: how much GT exceeds bicubic."""
    return jnp.sum(jnp.maximum(rb - xb, 0.0), axis=-1)


def afr(pb: jnp.ndarray, rb: jnp.ndarray, xb: jnp.ndarray) -> jnp.ndarray:
    """Achieved frequency restitution."""
    return jnp.sum(
        jnp.maximum(jnp.minimum(pb, rb), jnp.minimum(xb, rb)) - jnp.minimum(rb, xb),
        axis=-1,
    )


def frr(pb: jnp.ndarray, rb: jnp.ndarray, xb: jnp.ndarray) -> jnp.ndarray:
    """Frequency-restitution ratio AFR/PFR."""
    return afr(pb, rb, xb) / pfr(rb, xb)


def fro(pb: jnp.ndarray, rb: jnp.ndarray, xb: jnp.ndarray) -> jnp.ndarray:
    """Frequency-restitution overshoot (negative when pb exceeds rb)."""
    return jnp.sum(rb - jnp.maximum(pb, rb), axis=-1) / jnp.sum(rb, axis=-1)


def fru(pb: jnp.ndarray, rb: jnp.ndarray, xb: jnp.ndarray) -> jnp.ndarray:
    """Frequency-restitution undershoot below the bicubic floor."""
    return jnp.sum(xb - jnp.minimum(pb, xb), axis=-1) / jnp.sum(xb, axis=-1)


def attenuation_spectrum_np(image) -> "np.ndarray":
    """numpy twin of attenuation_spectrum for variable-shape host-side use
    (the compare_methods batch job sees a different crop shape per pair —
    a jitted path would recompile for every one)."""
    image = np.asarray(image)
    h, w = image.shape
    ids, n_rings = _ring_ids(h, w)
    spec = np.fft.fftshift(np.abs(np.fft.fft2(image)))
    f0 = spec[h // 2, w // 2]
    flat_ids = ids.reshape(-1)
    valid = flat_ids >= 0
    sums = np.bincount(flat_ids[valid], weights=spec.reshape(-1)[valid], minlength=n_rings)
    counts = np.bincount(flat_ids[valid], minlength=n_rings)
    means = sums / counts
    att = 10.0 * (np.log10(means) - np.log10(f0))
    return np.concatenate([[1.0], att])
