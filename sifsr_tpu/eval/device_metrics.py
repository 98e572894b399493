"""Batched on-device harness metrics: the whole 80-pair ASTER metric block
(reference model_perf_aster_formatds.py:371-438) as ONE jitted TPU call.

The harness's crops are variable-shape (each pair's warped common area is a
different rectangle), which is why eval/harness.py historically used the
numpy metric twins per pair (metrics.py ssim_np/gssim_np/...). Here the crops
are PADDED to a common (N, H, W) grid (valid data in the top-left corner)
and every metric is computed with masked-window semantics that are EXACTLY
the per-crop numpy values:

- window metrics (SSIM/GSSIM): only windows lying fully inside a pair's
  valid rectangle contribute — such windows never touch padding, so their
  window means equal the per-crop VALID means bit-for-bit (up to f32);
- pixel metrics (PSNR/RMSE/strata): masked sums/counts;
- per-pair percentiles (the gradient strata thresholds, :382-383): sort with
  +inf fill and interpolate at the fractional index of the VALID count —
  numpy's linear 'percentile' on the crop's values;
- the reference's nonzero-RMSE quirk (zeros excluded from stratified RMSE,
  :387-403) is reproduced with a sq > 0 mask.

f32 note: window variances of ~300 K imagery underflow catastrophically in
f32 (uxx - ux² cancels ~5 of 7 digits), so second-moment stats are computed
on per-image-centered values (shift-invariant) while the SSIM/GSSIM
luminance terms add the center back. Verified against the f64 numpy path to
<1e-4 per pair (tests/test_device_metrics.py).

The one host-side input besides the crops is the ASTER high-frequency field
|aster - PSF-lowpass(aster)| (:377-378): its reflect-boundary lowpass matrix
depends on each crop's exact shape, so it is two small per-pair host matmuls
(the same eval.harness.lowpass_matrix the per-pair path uses) — everything
downstream of it runs on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pad_crops", "batched_pair_metrics", "device_metric_rows"]

# metric columns produced (performances.csv layout minus LPIPS, which stays
# a host/weights-gated metric)
COLUMNS = (
    "PSNR",
    "SSIM",
    "RMSE",
    "RMSE (low grad per image)",
    "RMSE (mean grad per image)",
    "RMSE (high grad per image)",
    "GSSIM",
    "RMSE_grad",
)

_SOBELS = np.asarray(
    [
        [[1, 2, 1], [0, 0, 0], [-1, -2, -1]],
        [[1, 0, -1], [2, 0, -2], [1, 0, -1]],
        [[2, 1, 0], [1, 0, -1], [0, -1, -2]],
        [[0, 1, 2], [-1, 0, 1], [-2, -1, 0]],
    ],
    dtype=np.float32,
)


def pad_crops(crops: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Pad variable-shape 2-D crops into one (N, H, W) f32 array (top-left
    aligned, zero fill) + the (N, 2) valid shapes."""
    shapes = np.asarray([c.shape for c in crops], np.int32)
    H, W = shapes.max(axis=0)
    out = np.zeros((len(crops), H, W), np.float32)
    for i, c in enumerate(crops):
        out[i, : c.shape[0], : c.shape[1]] = c
    return out, shapes


def _rect_mask(h, w, H: int, W: int, shrink: int = 0) -> jnp.ndarray:
    """(H, W) mask of the positions an op with VALID extent `shrink` keeps
    inside a pair's (h, w) rectangle."""
    rows = jnp.arange(H)[:, None] < (h - shrink)
    cols = jnp.arange(W)[None, :] < (w - shrink)
    return rows & cols


def _masked_mean(x, mask):
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1)


def _valid_window_mean(x: jnp.ndarray, win: int) -> jnp.ndarray:
    from jax import lax

    kernel = jnp.full((win, win, 1, 1), 1.0 / (win * win), dtype=x.dtype)
    y = lax.conv_general_dilated(
        x[None, ..., None], kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
    return y[0, ..., 0]


def _conv_valid(x: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Cross-correlate (H, W) with a stack of (K, 3, 3) kernels -> (K, H-2, W-2).
    The reference applies scipy convolve2d (true convolution), so callers
    pass pre-flipped kernels where parity matters; the Sobel set used here
    is symmetric under the combined magnitude so orientation cancels."""
    from jax import lax

    k = jnp.moveaxis(kernels, 0, -1)[..., None, :]  # HWIO with I=1, O=K
    y = lax.conv_general_dilated(
        x[None, ..., None], k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
    return jnp.moveaxis(y[0], -1, 0)


def _masked_percentile(vals: jnp.ndarray, mask: jnp.ndarray, q: float):
    """numpy.percentile(vals[mask], q) with linear interpolation."""
    flat = jnp.where(mask.reshape(-1), vals.reshape(-1), jnp.inf)
    s = jnp.sort(flat)
    n = jnp.sum(mask)
    pos = (q / 100.0) * (n - 1).astype(jnp.float32)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo
    return s[lo] * (1 - frac) + s[hi] * frac


def _pair_metrics(sr, aster, grad, h, w, win: int = 7):
    """All 8 metric columns of ONE padded pair ((H, W) arrays, valid (h, w)
    rectangle). vmapped by batched_pair_metrics."""
    H, W = sr.shape
    m = _rect_mask(h, w, H, W)
    mf = m.astype(jnp.float32)

    # data_range over both images' valid pixels (:373-375)
    maxi = jnp.maximum(jnp.max(jnp.where(m, aster, -jnp.inf)),
                       jnp.max(jnp.where(m, sr, -jnp.inf)))
    mini = jnp.minimum(jnp.min(jnp.where(m, aster, jnp.inf)),
                       jnp.min(jnp.where(m, sr, jnp.inf)))
    data_range = maxi - mini
    c1 = jnp.square(0.01 * data_range)
    c2 = jnp.square(0.03 * data_range)
    n_valid = jnp.maximum(jnp.sum(mf), 1)

    diff = (sr - aster) * mf
    sq = diff * diff
    mse = jnp.sum(sq) / n_valid
    psnr = 10.0 * jnp.log10(jnp.square(data_range) / mse)
    rmse = jnp.sqrt(mse)

    # ---- stratified RMSE by ASTER HF-gradient quartiles (:382-403), with
    # the reference's exact-zero exclusion quirk
    lo_t = _masked_percentile(grad, m, 25.0)
    hi_t = _masked_percentile(grad, m, 75.0)

    def strat(stratum):
        sel = stratum & m & (sq > 0)
        cnt = jnp.sum(sel)
        return jnp.where(
            cnt > 0, jnp.sqrt(jnp.sum(jnp.where(sel, sq, 0.0)) / jnp.maximum(cnt, 1)),
            jnp.nan)

    rmse_low = strat(grad < lo_t)
    rmse_mid = strat((grad >= lo_t) & (grad <= hi_t))
    rmse_high = strat(grad > hi_t)

    # ---- center second-moment inputs (f32 cancellation; module docstring)
    cx = _masked_mean(aster, mf)
    cy = _masked_mean(sr, mf)
    xs = (aster - cx) * mf
    ys = (sr - cy) * mf

    # ---- SSIM over windows fully inside the valid rect (skimage semantics:
    # reflect-filtered then border-cropped == VALID windows; metrics.py)
    np_ = win * win
    cov_norm = np_ / (np_ - 1.0)
    wmask = _rect_mask(h, w, H - win + 1, W - win + 1, shrink=win - 1)
    ux_c = _valid_window_mean(xs, win)
    uy_c = _valid_window_mean(ys, win)
    vx = cov_norm * (_valid_window_mean(xs * xs, win) - ux_c * ux_c)
    vy = cov_norm * (_valid_window_mean(ys * ys, win) - uy_c * uy_c)
    vxy = cov_norm * (_valid_window_mean(xs * ys, win) - ux_c * uy_c)
    ux = ux_c + cx
    uy = uy_c + cy
    ssim_map = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2))
    ssim = jnp.sum(ssim_map * wmask) / jnp.maximum(jnp.sum(wmask), 1)

    # ---- 4-direction Sobel gradient-magnitude RMSE (:412-425)
    g_sr = _conv_valid(sr, jnp.asarray(_SOBELS))
    g_as = _conv_valid(aster, jnp.asarray(_SOBELS))
    mag_sr = jnp.sqrt(jnp.sum(g_sr * g_sr, axis=0))
    mag_as = jnp.sqrt(jnp.sum(g_as * g_as, axis=0))
    gmask = _rect_mask(h, w, H - 2, W - 2, shrink=2).astype(jnp.float32)
    rmse_grad = jnp.sqrt(
        jnp.sum(jnp.square(mag_sr - mag_as) * gmask) / jnp.maximum(jnp.sum(gmask), 1))

    # ---- GSSIM (reference utils.py:1904-2005): luminance from raw images
    # (inner 1-px trim), contrast/structure from the 2-direction Sobel mags
    sob2 = jnp.asarray(_SOBELS[:2])
    f2 = _conv_valid(aster, sob2)
    g2 = _conv_valid(sr, sob2)
    f_mag = jnp.sqrt(jnp.sum(f2 * f2, axis=0))
    g_mag = jnp.sqrt(jnp.sum(g2 * g2, axis=0))
    xs_in = xs[1:-1, 1:-1]
    ys_in = ys[1:-1, 1:-1]
    ufc = _valid_window_mean(xs_in, win)
    ugc = _valid_window_mean(ys_in, win)
    uf = _valid_window_mean(f_mag, win)
    ug = _valid_window_mean(g_mag, win)
    vf = cov_norm * (_valid_window_mean(f_mag * f_mag, win) - uf * uf)
    vg = cov_norm * (_valid_window_mean(g_mag * g_mag, win) - ug * ug)
    vfg = cov_norm * (_valid_window_mean(f_mag * g_mag, win) - uf * ug)
    lum = (2 * (ufc + cx) * (ugc + cy) + c1) / (
        jnp.square(ufc + cx) + jnp.square(ugc + cy) + c1)
    con = (2 * jnp.sqrt(vf) * jnp.sqrt(vg) + c2) / (vf + vg + c2)
    struct = (vfg + c2) / (jnp.sqrt(vf) * jnp.sqrt(vg) + c2 / 2)
    gwmask = _rect_mask(h, w, H - 2 - win + 1, W - 2 - win + 1,
                        shrink=2 + win - 1)
    gssim = jnp.sum(lum * con * struct * gwmask) / jnp.maximum(
        jnp.sum(gwmask), 1)

    return {
        "PSNR": psnr,
        "SSIM": ssim,
        "RMSE": rmse,
        "RMSE (low grad per image)": rmse_low,
        "RMSE (mean grad per image)": rmse_mid,
        "RMSE (high grad per image)": rmse_high,
        "GSSIM": gssim,
        "RMSE_grad": rmse_grad,
    }


@functools.partial(jax.jit, static_argnames=())
def batched_pair_metrics(sr_pad: jnp.ndarray, aster_pad: jnp.ndarray,
                         grad_pad: jnp.ndarray, shapes: jnp.ndarray) -> dict:
    """(N, H, W) padded crops + (N, 2) valid shapes -> dict of (N,) metric
    columns, all in one device program."""
    return jax.vmap(
        lambda s, a, g, hw: _pair_metrics(s, a, g, hw[0], hw[1])
    )(sr_pad, aster_pad, grad_pad, shapes)


def device_metric_rows(crop_pairs: list[tuple[np.ndarray, np.ndarray]]) -> list[dict]:
    """Host driver: pad the (crop_sr, crop_aster) list, build the per-pair
    ASTER HF-gradient fields (host matmuls — shape-dependent reflect-pad
    lowpass), run the single jitted metric program, return per-pair dicts."""
    from sifsr_tpu.ops.psf import lowpass_matrix

    srs = [p[0] for p in crop_pairs]
    asters = [p[1] for p in crop_pairs]
    grads = []
    for a in asters:
        mat = lowpass_matrix(a.shape[0], 4, 0.1)
        mat2 = lowpass_matrix(a.shape[1], 4, 0.1)
        grads.append(np.abs(a - mat @ a @ mat2.T))
    sr_pad, shapes = pad_crops(srs)
    aster_pad, _ = pad_crops(asters)
    grad_pad, _ = pad_crops(grads)
    out = jax.device_get(batched_pair_metrics(
        jnp.asarray(sr_pad), jnp.asarray(aster_pad), jnp.asarray(grad_pad),
        jnp.asarray(shapes)))
    n = len(crop_pairs)
    return [{k: float(out[k][i]) for k in COLUMNS} for i in range(n)]
