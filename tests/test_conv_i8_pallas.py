"""Fused int8 Pallas pair-conv: exactness vs an int32-exact XLA reference.

The reference semantics are the packed-domain int8 conv with packed-replicate
padding (models/quantized_packed.py path of the BN-folded ModelB_2 convs,
reference model.py:85-159). Runs in pallas interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from sifsr_tpu.models.packed import _replicate_pad_packed
from sifsr_tpu.pallas.conv_i8 import (
    conv_i8_exact,
    conv_i8_exact_dual,
    conv_i8_in1,
    pack_in1_weights,
    pack_row_tap_weights,
)


def _ref_conv(xpad_i8, wq, scale64, bias64, relu=True):
    y = lax.conv_general_dilated(
        jnp.asarray(xpad_i8), jnp.asarray(wq), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = np.asarray(y).astype(np.float32) * scale64 + bias64
    return np.maximum(y, 0) if relu else y


@pytest.mark.parametrize("hp,wp", [(32, 32), (16, 48)])
def test_conv_i8_exact(rng, hp, wp):
    """One custom call must equal the padded XLA int32 reference everywhere,
    including all four borders and corners."""
    x = rng.integers(-127, 128, (2, hp, wp, 64)).astype(np.int8)
    wq = rng.integers(-20, 21, (3, 3, 64, 64)).astype(np.int8)
    s_in = 0.03
    s_w = (0.001 + 0.01 * rng.random(64)).astype(np.float32)
    bias = rng.normal(size=64).astype(np.float32)

    xpad = np.asarray(_replicate_pad_packed(jnp.asarray(x), 16))
    y_ref = _ref_conv(xpad, wq, s_in * s_w, bias)

    wm, wc = pack_row_tap_weights(wq)
    comb = (s_in * s_w).astype(np.float32)
    y = conv_i8_exact(jnp.asarray(x), jnp.asarray(wm), jnp.asarray(wc),
                      jnp.asarray(np.tile(comb, 2)),
                      jnp.asarray(np.tile(bias, 2).astype(np.float32)),
                      hp, wp, relu=True, out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4, rtol=1e-5)


def test_conv_i8_exact_phase_mean(rng):
    """The fused second output must bit-match mean(s0p phases) * s_out
    computed from the requantized int8 output."""
    hp = wp = 32
    x = rng.integers(-127, 128, (2, hp, wp, 64)).astype(np.int8)
    wq = rng.integers(-10, 11, (3, 3, 64, 64)).astype(np.int8)
    s_in, s_out = 0.02, 0.15
    s_w = (0.001 + 0.005 * rng.random(64)).astype(np.float32)
    bias = rng.normal(size=64).astype(np.float32)

    wm, wc = pack_row_tap_weights(wq)
    comb = (s_in * s_w / s_out).astype(np.float32)
    y, pm = conv_i8_exact(jnp.asarray(x), jnp.asarray(wm), jnp.asarray(wc),
                          jnp.asarray(np.tile(comb, 2)),
                          jnp.asarray(np.tile(bias / s_out, 2).astype(np.float32)),
                          hp, wp, relu=True, phase_mean=float(s_out),
                          interpret=True)
    y = np.asarray(y)
    pm = np.asarray(pm).reshape(2, hp, wp, 16)
    pm_ref = np.mean(y.reshape(2, hp, wp, 4, 16).astype(np.float32),
                     axis=3) * s_out
    np.testing.assert_allclose(pm, pm_ref, atol=1e-5, rtol=1e-6)


@pytest.mark.parametrize("h,w", [(16, 32), (8, 16)])
def test_conv_i8_in1(rng, h, w):
    """The in-kernel tap-stacked 8->64 front conv must equal the padded XLA
    int32 reference everywhere (borders, corners, group seams)."""
    x = rng.integers(-127, 128, (2, h, w, 8)).astype(np.int8)
    q1 = rng.integers(-20, 21, (3, 3, 8, 64)).astype(np.int8)
    s_in = 0.03
    s_w = (0.001 + 0.01 * rng.random(64)).astype(np.float32)
    bias = rng.normal(size=64).astype(np.float32)

    xpad = np.asarray(_replicate_pad_packed(jnp.asarray(x), 2))
    y_ref = _ref_conv(xpad, q1, s_in * s_w, bias)

    w432 = pack_in1_weights(q1)
    comb = (s_in * s_w).astype(np.float32)
    y = conv_i8_in1(jnp.asarray(x), jnp.asarray(w432),
                    jnp.asarray(np.tile(comb, 16)),
                    jnp.asarray(np.tile(bias, 16).astype(np.float32)),
                    h, w, relu=True, out_dtype=jnp.float32, interpret=True)
    y = np.asarray(y).reshape(2, h, w, 64)
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-5)


def test_conv_i8_exact_dual(rng):
    hp, wp = 16, 48
    x = rng.integers(-127, 128, (2, hp, wp, 64)).astype(np.int8)
    z = rng.integers(-127, 128, (2, hp, wp, 64)).astype(np.int8)
    wqx = rng.integers(-20, 21, (3, 3, 64, 64)).astype(np.int8)
    wqz = rng.integers(-20, 21, (3, 3, 64, 64)).astype(np.int8)
    s_x, s_z = 0.03, 0.07
    s_w = (0.001 + 0.01 * rng.random(64)).astype(np.float32)
    bias = rng.normal(size=64).astype(np.float32)

    xpad = np.asarray(_replicate_pad_packed(jnp.asarray(x), 16))
    zpad = np.asarray(_replicate_pad_packed(jnp.asarray(z), 16))
    y_ref = (_ref_conv(xpad, wqx, s_x * s_w, 0 * bias, relu=False)
             + _ref_conv(zpad, wqz, s_z * s_w, bias, relu=False))
    y_ref = np.maximum(y_ref, 0)

    wm_x, wc_x = pack_row_tap_weights(wqx)
    wm_z, wc_z = pack_row_tap_weights(wqz)
    y = conv_i8_exact_dual(
        jnp.asarray(x), jnp.asarray(z),
        jnp.asarray(wm_x), jnp.asarray(wc_x), jnp.asarray(wm_z),
        jnp.asarray(wc_z),
        jnp.asarray(np.tile((s_x * s_w).astype(np.float32), 2)),
        jnp.asarray(np.tile((s_z * s_w).astype(np.float32), 2)),
        jnp.asarray(np.tile(bias, 2).astype(np.float32)),
        hp, wp, relu=True, out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("h,w", [(16, 32), (8, 16)])
def test_conv_i8_in1_split(rng, h, w):
    """The split-source front conv (two refs, in-register K-concat) is
    bit-identical to conv_i8_in1 on the channel-interleaved concat."""
    from sifsr_tpu.pallas.conv_i8 import conv_i8_in1_split, in1_split_weights

    lst4 = rng.integers(-127, 128, (2, h, w, 4)).astype(np.int8)
    ndvi4 = rng.integers(-127, 128, (2, h, w, 4)).astype(np.int8)
    q1 = rng.integers(-20, 21, (3, 3, 8, 64)).astype(np.int8)
    s_w = (0.001 + 0.01 * rng.random(64)).astype(np.float32)
    bias = rng.normal(size=64).astype(np.float32)
    comb = (0.03 * s_w).astype(np.float32)
    sc = jnp.asarray(np.tile(comb, 16))
    bv = jnp.asarray(np.tile(bias, 16).astype(np.float32))

    xq = np.stack([lst4, ndvi4], axis=-1).reshape(2, h, w, 8)
    w432 = pack_in1_weights(q1)
    want = np.asarray(conv_i8_in1(jnp.asarray(xq), jnp.asarray(w432), sc, bv,
                                  h, w, interpret=True))
    got = np.asarray(conv_i8_in1_split(
        jnp.asarray(lst4), jnp.asarray(ndvi4),
        jnp.asarray(in1_split_weights(w432)), sc, bv, h, w, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("hp,wp", [(32, 32), (16, 48)])
def test_conv_i8_outlay(rng, hp, wp):
    """The outlay tail kernel (64 -> 4, fused dequant/de-normalise epilogue,
    exact replicate borders) must equal the padded XLA int32 reference
    everywhere, and its documented lane->fine-pixel map must reproduce the
    depth-to-space SR assembly."""
    from sifsr_tpu.models.packed import _depth_to_space
    from sifsr_tpu.pallas.conv_i8 import conv_i8_outlay, pack_outlay_weights

    x = rng.integers(-127, 128, (2, hp, wp, 64)).astype(np.int8)
    wq = rng.integers(-20, 21, (3, 3, 64, 4)).astype(np.int8)
    s_in = 0.03
    s_w = (0.001 + 0.01 * rng.random(4)).astype(np.float32)
    bias = rng.normal(size=4).astype(np.float32)

    xpad = np.asarray(_replicate_pad_packed(jnp.asarray(x), 16))
    y_ref = _ref_conv(xpad, wq, s_in * s_w, bias, relu=False)
    sr_ref = np.asarray(_depth_to_space(jnp.asarray(y_ref), 1))[..., 0]

    wm, wc = pack_outlay_weights(wq)
    olf = conv_i8_outlay(jnp.asarray(x), jnp.asarray(wm), jnp.asarray(wc),
                         jnp.asarray(np.tile(s_in * s_w, 2)),
                         jnp.asarray(np.tile(bias, 2).astype(np.float32)),
                         hp, wp, interpret=True)
    wb = wp // 2
    sr = np.asarray(olf).reshape(2, hp, wb, 2, 2, 2).transpose(
        0, 1, 4, 2, 3, 5).reshape(2, 2 * hp, 2 * wp)
    np.testing.assert_allclose(sr, sr_ref, atol=1e-4, rtol=1e-5)
