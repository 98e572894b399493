"""Metric parity vs independent scipy/numpy recompositions of the
skimage/reference formulas (skimage itself is not installed here; the
recompositions below follow the exact published algorithms)."""

import numpy as np
import pytest
import scipy as sp
from scipy.ndimage import uniform_filter

import jax.numpy as jnp

from sifsr_tpu.eval import (
    attenuation_spectrum,
    frr,
    gradient_rmse,
    gssim,
    pfr,
    psnr_batch_mean,
    ssim,
    ssim_batch_mean,
    stratified_rmse,
)


def _skimage_ssim(im1, im2, data_range, win_size=7):
    """skimage.metrics.structural_similarity float defaults, re-derived."""
    im1 = im1.astype(np.float64)
    im2 = im2.astype(np.float64)
    NP = win_size**2
    cov_norm = NP / (NP - 1)
    f = lambda x: uniform_filter(x, size=win_size)  # mode='reflect' default
    ux, uy = f(im1), f(im2)
    vx = cov_norm * (f(im1 * im1) - ux**2)
    vy = cov_norm * (f(im2 * im2) - uy**2)
    vxy = cov_norm * (f(im1 * im2) - ux * uy)
    C1, C2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux**2 + uy**2 + C1) * (vx + vy + C2))
    pad = (win_size - 1) // 2
    return S[pad:-pad, pad:-pad].mean()


def _reference_gssim(im1, im2, data_range, win_size=7):
    """numpy recomposition of reference utils.py:1904-2005."""
    im1 = im1.astype(np.float64)
    im2 = im2.astype(np.float64)
    filters = [
        [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]],
        [[-1, -2, -1], [0, 0, 0], [1, 2, 1]],
    ]
    f0 = sp.signal.convolve2d(im1, filters[0], mode="valid")
    f1 = sp.signal.convolve2d(im1, filters[1], mode="valid")
    g0 = sp.signal.convolve2d(im2, filters[0], mode="valid")
    g1 = sp.signal.convolve2d(im2, filters[1], mode="valid")
    f_mag = np.sqrt(f0**2 + f1**2)
    g_mag = np.sqrt(g0**2 + g1**2)
    im1, im2 = im1[1:-1, 1:-1], im2[1:-1, 1:-1]
    NP = win_size**2
    cov_norm = NP / (NP - 1)
    f = lambda x: uniform_filter(x, size=win_size)
    ux, uy = f(im1), f(im2)
    vx = cov_norm * (f(f_mag * f_mag) - f(f_mag) ** 2)
    vy = cov_norm * (f(g_mag * g_mag) - f(g_mag) ** 2)
    vxy = cov_norm * (f(f_mag * g_mag) - f(f_mag) * f(g_mag))
    C1, C2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    L = (2 * ux * uy + C1) / (ux**2 + uy**2 + C1)
    C = (2 * np.sqrt(vx) * np.sqrt(vy) + C2) / (vx + vy + C2)
    S = (vxy + C2) / (np.sqrt(vx) * np.sqrt(vy) + C2 / 2)
    pad = (win_size - 1) // 2
    return (L * C * S)[pad:-pad, pad:-pad].mean()


def _reference_attenuation(im_fft):
    """numpy recomposition of reference utils.py:598-637."""
    center = (im_fft.shape[0] // 2, im_fft.shape[1] // 2)
    yy, xx = np.meshgrid(np.arange(im_fft.shape[0]), np.arange(im_fft.shape[1]), indexing="ij")
    d2 = (yy - center[0]) ** 2 + (xx - center[1]) ** 2
    f0 = im_fft[center]
    out = [1.0]
    for r in range(0, min(center[0] - 1, center[1] - 1)):
        mask = (d2 <= (r + 1) ** 2) & (d2 > r**2)
        out.append(10 * (np.log10(im_fft[mask].mean()) - np.log10(f0)))
    return np.array(out)


def test_psnr_matches_reference_convention(rng):
    pred = rng.normal(size=(4, 64, 64)).astype(np.float32)
    targ = rng.normal(size=(4, 64, 64)).astype(np.float32)
    dr = targ.max() - targ.min()
    want = np.mean(
        [10 * np.log10(dr**2 / np.mean((targ[i] - pred[i]) ** 2)) for i in range(4)]
    )
    got = float(psnr_batch_mean(jnp.asarray(pred), jnp.asarray(targ)))
    assert abs(got - want) < 1e-4


def test_ssim_matches_skimage_formula(rng):
    pred = rng.normal(size=(3, 64, 64)).astype(np.float32)
    targ = rng.normal(size=(3, 64, 64)).astype(np.float32)
    dr = float(targ.max() - targ.min())
    want = np.mean([_skimage_ssim(targ[i], pred[i], dr) for i in range(3)])
    got = float(ssim_batch_mean(jnp.asarray(pred), jnp.asarray(targ)))
    assert abs(got - want) < 1e-5


def test_ssim_identical_images_is_one(rng):
    img = rng.normal(size=(1, 32, 32)).astype(np.float32)
    got = np.asarray(ssim(jnp.asarray(img), jnp.asarray(img), jnp.asarray(1.0)))
    np.testing.assert_allclose(got, 1.0, atol=1e-6)


def test_gssim_matches_reference_formula(rng):
    pred = (290 + 5 * rng.normal(size=(2, 64, 64))).astype(np.float32)
    targ = (290 + 5 * rng.normal(size=(2, 64, 64))).astype(np.float32)
    dr = float(targ.max() - targ.min())
    want = np.array([_reference_gssim(targ[i], pred[i], dr) for i in range(2)])
    got = np.asarray(gssim(jnp.asarray(pred), jnp.asarray(targ), jnp.asarray(dr)))
    # gssim of uncorrelated noise is ~1e-4-scale; f32 vs f64 needs an atol
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)


def test_attenuation_spectrum_matches_reference(rng):
    img = rng.normal(size=(64, 64)).astype(np.float64)
    im_fft = np.fft.fftshift(np.abs(sp.fft.fft2(img)))
    want = _reference_attenuation(im_fft)
    got = np.asarray(attenuation_spectrum(jnp.asarray(img)))
    assert got.shape == want.shape
    # jnp.fft runs in float32 (x64 disabled); the reference uses float64.
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


def test_frequency_restitution_scores(rng):
    rb = rng.normal(size=(32,))
    xb = rb - np.abs(rng.normal(size=(32,)))  # bicubic attenuates more
    pb = (rb + xb) / 2
    want_pfr = np.sum(np.maximum(rb - xb, 0))
    want_afr = np.sum(np.maximum(np.minimum(pb, rb), np.minimum(xb, rb)) - np.minimum(rb, xb))
    got_frr = float(frr(jnp.asarray(pb), jnp.asarray(rb), jnp.asarray(xb)))
    assert abs(got_frr - want_afr / want_pfr) < 1e-6
    assert abs(float(pfr(jnp.asarray(rb), jnp.asarray(xb))) - want_pfr) < 1e-6
    # the halfway prediction restores about half the potential
    assert 0.3 < got_frr < 0.7


def test_gradient_rmse_zero_for_identical(rng):
    img = rng.normal(size=(2, 32, 32)).astype(np.float32)
    got = np.asarray(gradient_rmse(jnp.asarray(img), jnp.asarray(img)))
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_stratified_rmse_partitions(rng):
    pred = rng.normal(size=(1, 64, 64)).astype(np.float32)
    targ = rng.normal(size=(1, 64, 64)).astype(np.float32)
    field = rng.normal(size=(1, 64, 64)).astype(np.float32)
    lo, mid, hi = stratified_rmse(jnp.asarray(pred), jnp.asarray(targ), jnp.asarray(field))
    overall = np.sqrt(np.mean((pred - targ) ** 2))
    for v in (float(lo[0]), float(mid[0]), float(hi[0])):
        assert 0.2 * overall < v < 3.0 * overall
