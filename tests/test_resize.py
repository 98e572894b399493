"""Parity tests: sifsr_tpu.ops.resize vs cv2 / torch reference conventions."""

import cv2
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sifsr_tpu.ops import (
    cubic_resize,
    downsample_bicubic,
    upsample_bicubic,
    upsample_bilinear_x2,
)


@pytest.mark.parametrize("size,factor", [(64, 4), (16, 4), (32, 2)])
def test_upsample_matches_cv2_inter_cubic(rng, size, factor):
    img = rng.normal(size=(size, size)).astype(np.float32)
    want = cv2.resize(
        img,
        dsize=(size * factor, size * factor),
        fx=factor,
        fy=factor,
        interpolation=cv2.INTER_CUBIC,
    )
    got = np.asarray(upsample_bicubic(jnp.asarray(img), factor))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_upsample_batched_channels(rng):
    img = rng.normal(size=(3, 1, 64, 64)).astype(np.float32)
    got = np.asarray(upsample_bicubic(jnp.asarray(img), 4))
    assert got.shape == (3, 1, 256, 256)
    for b in range(3):
        want = cv2.resize(img[b, 0], dsize=(256, 256), interpolation=cv2.INTER_CUBIC)
        np.testing.assert_allclose(got[b, 0], want, atol=2e-5)


@pytest.mark.parametrize("size,factor", [(264, 4), (256, 4), (72, 4)])
def test_downsample_matches_torch_bicubic(rng, size, factor):
    img = rng.normal(size=(2, 1, size, size)).astype(np.float32)
    with torch.no_grad():
        want = F.interpolate(
            torch.from_numpy(img), scale_factor=1 / factor, mode="bicubic"
        ).numpy()
    got = np.asarray(downsample_bicubic(jnp.asarray(img), factor))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


@pytest.mark.parametrize("size", [32, 64, 128])
def test_bilinear_x2_matches_torch_align_corners(rng, size):
    img = rng.normal(size=(2, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        want = torch.nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)(
            torch.from_numpy(img)
        ).numpy()
    got = np.asarray(upsample_bilinear_x2(jnp.asarray(img)))
    # torch evaluates the source-index fractions in float32; our float64
    # weights differ by ~1 ulp of float32 per tap, bounded well below 5e-5.
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-5)


def test_cubic_resize_identity(rng):
    img = rng.normal(size=(8, 8)).astype(np.float32)
    got = np.asarray(cubic_resize(jnp.asarray(img), (8, 8)))
    np.testing.assert_allclose(got, img, atol=1e-6)


def test_upsample_bilinear_nhwc_hp_matches_nchw(rng):
    """The training UpBlock's NHWC-native upsample (round 5 — kills the
    moveaxis transpose copies) must match the NCHW matrix path."""
    import jax.numpy as jnp

    from sifsr_tpu.ops.resize import (upsample_bilinear_x2,
                                      upsample_bilinear_x2_nhwc_hp)

    x = rng.normal(size=(2, 12, 9, 5)).astype(np.float32)
    want = np.moveaxis(np.asarray(
        upsample_bilinear_x2(jnp.moveaxis(jnp.asarray(x), -1, 1))), 1, -1)
    got = np.asarray(upsample_bilinear_x2_nhwc_hp(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
