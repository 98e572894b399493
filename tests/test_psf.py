"""Parity tests for the PSF/MTF sensor model vs a torch composition that
mirrors the reference chain (utils.py:1615-1894) op-for-op."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sifsr_tpu.ops import (
    downscale_lst_sr_to_lr,
    downscale_lst_sr_to_lr_test,
    generate_psf_kernel,
    lowpass_ftm,
    norm_l4_downsample,
    psf_kernel_1d,
)


def _reference_psf_kernel(res, mtf_res, mtf_fc, half_kernel_width=None):
    """Independent closed-form evaluation of the reference's PSF definition."""
    fc = 0.5 / mtf_res
    sigma = math.sqrt(-math.log(mtf_fc) / 2) / (math.pi * fc)
    if half_kernel_width is None:
        half_kernel_width = int(math.ceil(mtf_res / res))
    ii, jj = np.meshgrid(
        np.arange(-half_kernel_width, half_kernel_width + 1),
        np.arange(-half_kernel_width, half_kernel_width + 1),
        indexing="ij",
    )
    dist = res * np.sqrt(ii**2 + jj**2)
    kernel = np.exp(-(dist * dist) / (2 * sigma * sigma)) / (sigma * math.sqrt(2 * math.pi))
    return (kernel / kernel.sum()).astype(np.float32)


def _torch_downscale(data, factor=4, mtf=0.1, deci_type="bic"):
    """torch re-composition of reference utils.downscale_LST_SR_to_LR."""
    kernel = torch.tensor(_reference_psf_kernel(1.0, factor, mtf))
    hw = (kernel.shape[-1] - 1) // 2
    x = F.pad(data, (hw, hw, hw, hw), mode="reflect")
    x = F.conv2d(x, kernel[None, None].expand(x.shape[1], -1, -1, -1),
                 groups=x.shape[1], padding="same")
    if deci_type == "bic":
        x = F.interpolate(x, scale_factor=1 / factor, mode="bicubic")
        size_loss = int(hw / factor)
        return x[:, :, size_loss : x.shape[-2] - size_loss, size_loss : x.shape[-1] - size_loss]
    x = x[:, :, hw : x.shape[-2] - hw, hw : x.shape[-1] - hw]
    x = x.unfold(3, 4, 4).unfold(2, 4, 4)
    return torch.pow(torch.sum(torch.pow(x, 4), dim=(-1, -2)) / 16.0, 0.25)


@pytest.mark.parametrize(
    "res,mtf_res,mtf_fc,hkw",
    [(1.0, 4.0, 0.1, None), (1.0, 4.0, 0.25, None), (1.0, 926.25 / 90, 0.1, None), (1.0, 2.0, 0.1, 3)],
)
def test_psf_kernel_matches_reference_formula(res, mtf_res, mtf_fc, hkw):
    want = _reference_psf_kernel(res, mtf_res, mtf_fc, hkw)
    got = generate_psf_kernel(res, mtf_res, mtf_fc, hkw)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)
    assert abs(got.sum() - 1.0) < 1e-6


def test_psf_kernel_is_separable():
    g = psf_kernel_1d(1.0, 4.0, 0.1)
    k2d = generate_psf_kernel(1.0, 4.0, 0.1)
    np.testing.assert_allclose(np.outer(g, g), k2d, rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("deci_type", ["bic", "norm-L4"])
def test_downscale_matches_torch_chain(rng, deci_type):
    # LST-like positive data (norm-L4 needs positivity, like Kelvin temps).
    img = (290.0 + 10.0 * rng.normal(size=(2, 1, 256, 256))).astype(np.float32)
    want = _torch_downscale(torch.from_numpy(img), deci_type=deci_type).numpy()
    got = np.asarray(downscale_lst_sr_to_lr(jnp.asarray(img), deci_type=deci_type))
    assert got.shape == want.shape == (2, 1, 64, 64)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-3)


def test_downscale_test_variant_skips_psf(rng):
    """The `_test` variant (utils.py:1716-1756) never convolves with the PSF;
    'bic' = pad+decimate+crop, 'norm-L4' = plain norm-L4 pool."""
    img = (0.5 * rng.normal(size=(256, 256))).astype(np.float32)
    t = torch.from_numpy(img)[None, None]
    hw = 4
    padded = F.pad(t, (hw, hw, hw, hw), mode="reflect")
    want_bic = F.interpolate(padded, scale_factor=0.25, mode="bicubic")[:, :, 1:-1, 1:-1].numpy()
    got_bic = np.asarray(downscale_lst_sr_to_lr_test(jnp.asarray(img)[None, None], deci_type="bic"))
    np.testing.assert_allclose(got_bic, want_bic, rtol=1e-4, atol=1e-5)

    img_pos = np.abs(img) + 1.0
    got_l4 = np.asarray(downscale_lst_sr_to_lr_test(jnp.asarray(img_pos)[None, None], deci_type="norm-L4"))
    want_l4 = np.asarray(norm_l4_downsample(jnp.asarray(img_pos)[None, None], 4))
    np.testing.assert_allclose(got_l4, want_l4, rtol=1e-6)


def test_lowpass_ftm_matches_torch(rng):
    img = rng.normal(size=(2, 1, 256, 256)).astype(np.float32)
    kernel = torch.tensor(_reference_psf_kernel(1.0, 4, 0.25))
    hw = (kernel.shape[-1] - 1) // 2
    x = F.pad(torch.from_numpy(img), (hw, hw, hw, hw), mode="reflect")
    x = F.conv2d(x, kernel[None, None].expand(x.shape[1], -1, -1, -1),
                 groups=x.shape[1], padding="same")
    want = x[:, :, hw:-hw, hw:-hw].numpy()
    got = np.asarray(lowpass_ftm(jnp.asarray(img), mtf=0.25))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_norm_l4_constant_blocks():
    """Closed form: pooling a constant block returns the constant."""
    x = jnp.full((1, 1, 8, 8), 3.0)
    np.testing.assert_allclose(np.asarray(norm_l4_downsample(x, 4)), 3.0, rtol=1e-6)
