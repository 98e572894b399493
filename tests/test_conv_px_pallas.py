"""Exactness of the generalized p-pixel-row mid-chain convs (pallas/conv_px)
against an int32-exact XLA reference, borders and corners included.

The reference computes the same quantization chain (int8 weights, int32
accumulation, f32 scale+bias+ReLU epilogue, round/clip requant) with
lax.conv on NHWC edge-padded tensors — the kernels must match bit-for-bit.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from sifsr_tpu.pallas.conv_px import (
    conv_prow,
    conv_prow_dual,
    conv_prow_dual_planes,
    conv_prow_split_pool,
    conv_prow_up2,
    nhwc_to_rows,
    pack_prow_weights,
    planes_to_nhwc,
    prow_leaf,
    rows_to_nhwc,
    up2_coeffs,
    up2_perm,
)


def _ref_conv_i32(x_q, k_q):
    """Edge-padded 3x3 conv, int8 operands, exact int32 accumulator."""
    xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return lax.conv_general_dilated(
        xp, jnp.asarray(k_q), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _ref_epilogue(y, leaf, c_out, relu=True):
    sc = np.asarray(leaf["scale"])[:c_out]
    b = np.asarray(leaf["bias"])[:c_out]
    yf = y.astype(jnp.float32) * sc + b
    if relu:
        yf = jnp.maximum(yf, 0.0)
    return yf


def _requant(yf):
    return jnp.clip(jnp.round(yf), -127, 127).astype(jnp.int8)


def _rand_case(rng, n, h, w, c, c_out):
    x_q = rng.integers(-127, 128, (n, h, w, c), dtype=np.int8)
    k = rng.normal(size=(3, 3, c, c_out)).astype(np.float32) * 0.2
    bias = rng.normal(size=(c_out,)).astype(np.float32)
    return jnp.asarray(x_q), k, bias


CASES = [
    # (p, c, c_out, h, w) — the three mid-chain lane geometries
    (8, 16, 16, 16, 32),
    (4, 32, 32, 16, 16),
    (2, 64, 64, 8, 8),
    (2, 64, 32, 8, 16),   # narrowing conv (ub1.conv1-like output width)
]


@pytest.mark.parametrize("p,c,c_out,h,w", CASES)
def test_conv_prow_exact(rng, p, c, c_out, h, w):
    x_q, k, bias = _rand_case(rng, 3, h, w, c, c_out)
    leaf = prow_leaf(k, bias, p, s_in=0.11, s_out=0.07)
    got = conv_prow(nhwc_to_rows(x_q, p), leaf, p, c, c_out, h, w,
                    interpret=True)
    got = rows_to_nhwc(got, h, w, c_out)

    q, _ = np.clip(np.round(np.asarray(k, np.float64)
                            / (np.maximum(np.abs(k).max(axis=(0, 1, 2)), 1e-12)
                               / 127.0)), -127, 127).astype(np.int8), None
    want = _requant(_ref_epilogue(_ref_conv_i32(x_q, q), leaf, c_out))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_conv_prow_residual_exact(rng):
    p, c, h, w = 8, 16, 16, 32
    x_q, k, bias = _rand_case(rng, 2, h, w, c, c)
    v0 = jnp.asarray(rng.integers(-127, 128, (2, h, w, c), dtype=np.int8))
    leaf = prow_leaf(k, bias, p, s_in=0.2, s_out=None, post_scale=1 / 0.15)
    leaf["res_sc"] = jnp.full((p * c,), np.float32(0.2 / 0.15))
    got = conv_prow(nhwc_to_rows(x_q, p), leaf, p, c, c, h, w,
                    residual=nhwc_to_rows(v0, p), interpret=True)
    got = rows_to_nhwc(got, h, w, c)

    q, _ = _quant_ref(k)
    yf = _ref_epilogue(_ref_conv_i32(x_q, q), leaf, c)
    want = _requant(v0.astype(jnp.float32) * np.float32(0.2 / 0.15) + yf)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _quant_ref(k):
    s = np.maximum(np.abs(np.asarray(k, np.float64)).max(axis=(0, 1, 2)),
                   1e-12) / 127.0
    q = np.clip(np.round(np.asarray(k, np.float64) / s), -127, 127)
    return q.astype(np.int8), s


def test_conv_prow_split_exact(rng):
    """p*c_out > 128: the split epilogue's two half-row planes interleave
    back to the exact NHWC conv output."""
    p, c, c_out, h, w = 8, 16, 32, 16, 32
    x_q, k, bias = _rand_case(rng, 2, h, w, c, c_out)
    leaf = prow_leaf(k, bias, p, s_in=0.13, s_out=0.09)
    lo, hi = conv_prow(nhwc_to_rows(x_q, p), leaf, p, c, c_out, h, w,
                       split=True, interpret=True)
    got = planes_to_nhwc(lo, hi, h, w, p, c_out)

    q, _ = _quant_ref(k)
    want = _requant(_ref_epilogue(_ref_conv_i32(x_q, q), leaf, c_out))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_conv_prow_dual_exact(rng):
    """conv(concat(x, z)) == dual kernel, exactly."""
    p, c, c_out, h, w = 2, 64, 32, 8, 16
    x_q, kx, bias = _rand_case(rng, 2, h, w, c, c_out)
    z_q, kz, _ = _rand_case(rng, 2, h, w, c, c_out)
    leafx = prow_leaf(kx, bias, p, s_in=0.1, s_out=0.05)
    leafz = prow_leaf(kz, np.zeros_like(bias), p, s_in=0.21, s_out=0.05)
    got = conv_prow_dual(nhwc_to_rows(x_q, p), nhwc_to_rows(z_q, p),
                         leafx, leafz, p, c, c_out, h, w, interpret=True)
    got = rows_to_nhwc(got, h, w, c_out)

    qx, _ = _quant_ref(kx)
    qz, _ = _quant_ref(kz)
    yf = (_ref_conv_i32(x_q, qx).astype(jnp.float32) * np.asarray(leafx["scale"])[:c_out]
          + _ref_conv_i32(z_q, qz).astype(jnp.float32) * np.asarray(leafz["scale"])[:c_out]
          + np.asarray(leafx["bias"])[:c_out])
    want = _requant(jnp.maximum(yf, 0.0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("p,c,c_out,h,w", [(8, 16, 32, 16, 32),
                                           (4, 32, 64, 8, 16)])
def test_conv_prow_split_pool_exact(rng, p, c, c_out, h, w):
    """Split conv + fused 2x2 pool: lo/hi match the split kernel; pooled
    matches _pool_quant_i8 on the interleaved NHWC output, emitted in the
    next level's rows form."""
    from sifsr_tpu.models.pallas_serving import _pool_quant_i8

    s_out, s_next = 0.09, 0.06
    x_q, k, bias = _rand_case(rng, 2, h, w, c, c_out)
    leaf = prow_leaf(k, bias, p, s_in=0.13, s_out=s_out)
    leaf["pool_sc"] = jnp.full((128,), np.float32(s_out / (4 * s_next)))
    lo, hi, pooled = conv_prow_split_pool(nhwc_to_rows(x_q, p), leaf, p, c,
                                          c_out, h, w, interpret=True)
    got_full = planes_to_nhwc(lo, hi, h, w, p, c_out)

    q, _ = _quant_ref(k)
    want = _requant(_ref_epilogue(_ref_conv_i32(x_q, q), leaf, c_out))
    np.testing.assert_array_equal(np.asarray(got_full), np.asarray(want))

    want_pool = _pool_quant_i8(want, s_out, s_next)
    got_pool = np.asarray(pooled).reshape(2, h // 2, w // 2, c_out)
    np.testing.assert_array_equal(got_pool, np.asarray(want_pool))


def test_conv_prow_dual_planes_exact(rng):
    """The planes-z prologue interleave equals conv_prow_dual on the
    interleaved rows."""
    p, c, c_out, h, w = 4, 32, 32, 8, 16
    x_q, kx, bias = _rand_case(rng, 2, h, w, c, c_out)
    z_q, kz, _ = _rand_case(rng, 2, h, w, c, c_out)
    leafx = prow_leaf(kx, bias, p, s_in=0.1, s_out=0.05)
    leafz = prow_leaf(kz, np.zeros_like(bias), p, s_in=0.21, s_out=0.05)
    want = conv_prow_dual(nhwc_to_rows(x_q, p), nhwc_to_rows(z_q, p),
                          leafx, leafz, p, c, c_out, h, w, interpret=True)

    # producer planes: lo/hi are alternate CONSUMER groups (the producer's
    # split halves at doubled p), full 128-lane rows each
    z6 = np.asarray(z_q).reshape(2, h, w // (2 * p), 2, p * c)
    z_lo = jnp.asarray(z6[:, :, :, 0].reshape(2, h * w // (2 * p), p * c))
    z_hi = jnp.asarray(z6[:, :, :, 1].reshape(2, h * w // (2 * p), p * c))
    got = conv_prow_dual_planes(nhwc_to_rows(x_q, p), z_lo, z_hi,
                                leafx, leafz, p, c, c_out, h, w,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("p,c,c_out,p_out,h,w,fold", [
    (2, 64, 64, 2, 8, 16, 1),      # db3.last-like
    (4, 64, 32, 4, 8, 16, 2),      # ub1.conv2-like (folded input rows)
])
def test_conv_prow_up2_exact(rng, p, c, c_out, p_out, h, w, fold):
    """Conv + fused align-corners x2: bit-identical to conv_prow followed
    by the pallas phase upsample (resize_phases), after undoing the e-major
    group permutation."""
    from sifsr_tpu.pallas.resize_phases import phases_to_nhwc, upsample_phases

    s_mid, s_up = 0.12, 0.2
    x_q, k, bias = _rand_case(rng, 2, h, w, c, c_out)
    leaf = prow_leaf(k, bias, p, s_in=0.17, s_out=s_mid)
    _, rc, cc, inv = up2_coeffs(h, w, c_out, s_mid, s_up)
    leaf.update(rc=jnp.asarray(rc), cc=jnp.asarray(cc), inv=jnp.asarray(inv))

    x_rows = nhwc_to_rows(x_q, p // fold)              # producer layout
    got = conv_prow_up2(x_rows, leaf, p, c, c_out, p_out, h, w, fold=fold,
                        interpret=True)

    qk, _ = _quant_ref(k)
    mid_nhwc = _requant(_ref_epilogue(_ref_conv_i32(x_q, qk), leaf, c_out))
    up = upsample_phases(mid_nhwc, 2, "linear_ac", out_dtype=jnp.int8,
                         scale=s_up, in_scale=s_mid, interpret=True)
    want = np.asarray(phases_to_nhwc(up))              # (2, 2h, 2w, c_out)

    inv_perm = np.argsort(np.asarray(up2_perm(p_out)))
    got = np.asarray(got).reshape(2, 2 * h, (2 * w) // p_out, p_out, c_out)
    got = got[:, :, :, inv_perm, :].reshape(2, 2 * h, 2 * w, c_out)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("h,n", [(16, 2), (32, 3)])
def test_conv_prow_up2_pack_exact(rng, h, n):
    """The serving-tail kernel (conv + final x2 + space-to-depth packing to
    pair rows) is bit-identical to conv -> pallas phase upsample ->
    phases_to_packed_x2 (two geometries; n=3 exercises the ib divisor
    fallback)."""
    from sifsr_tpu.pallas.resize_phases import (
        phases_to_packed_x2, upsample_phases)
    from sifsr_tpu.pallas.conv_px import conv_prow_up2_pack

    p, c = 8, 32                                       # folded geometry
    s_mid, s_up = 0.15, 0.25
    x_q, k, bias = _rand_case(rng, n, h, h, c, 16)
    leaf = prow_leaf(k, bias, p, s_in=0.19, s_out=s_mid)
    _, rc, cc, inv = up2_coeffs(h, h, 16, s_mid, s_up)
    leaf.update(rc=jnp.asarray(rc), cc=jnp.asarray(cc), inv=jnp.asarray(inv))

    got = conv_prow_up2_pack(nhwc_to_rows(x_q, p // 2), leaf, p, c, h,
                             fold=2, interpret=True)
    got = np.asarray(got).reshape(n, h, h, 64)

    qk, _ = _quant_ref(k)
    mid_nhwc = _requant(_ref_epilogue(_ref_conv_i32(x_q, qk), leaf, 16))
    up = upsample_phases(mid_nhwc, 2, "linear_ac", out_dtype=jnp.int8,
                         scale=s_up, in_scale=s_mid, interpret=True)
    want = np.asarray(phases_to_packed_x2(up))
    np.testing.assert_array_equal(got, want)


def test_conv_prow_fold_exact(rng):
    """fold=2 (doubled-p plain conv) equals the unfolded conv."""
    p, c, c_out, h, w = 8, 32, 16, 8, 16
    x_q, k, bias = _rand_case(rng, 2, h, w, c, c_out)
    leaf = prow_leaf(k, bias, p, s_in=0.11, s_out=0.07)
    rows4 = nhwc_to_rows(x_q, p // 2)                  # the producer's p=4
    got = conv_prow(rows4, leaf, p, c, c_out, h, w, fold=2, interpret=True)
    got = rows_to_nhwc(got, h, w, c_out)
    q, _ = _quant_ref(k)
    want = _requant(_ref_epilogue(_ref_conv_i32(x_q, q), leaf, c_out))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pack_prow_weights_dense_equivalence(rng):
    """The banded WM/WC matmuls reproduce a dense conv: checked through the
    kernel path on a case where every pixel is interior-or-border."""
    p, c, c_out, h, w = 4, 32, 16, 8, 8
    x_q, k, bias = _rand_case(rng, 1, h, w, c, c_out)
    leaf = prow_leaf(k, bias, p, s_in=0.3, s_out=0.2)
    wm, wc = pack_prow_weights(_quant_ref(k)[0], p)
    assert wm.shape == (3 * p * c, p * c_out)
    assert wc.shape == (6 * c, p * c_out)
    got = rows_to_nhwc(conv_prow(nhwc_to_rows(x_q, p), leaf, p, c, c_out,
                                 h, w, interpret=True), h, w, c_out)
    want = _requant(_ref_epilogue(_ref_conv_i32(x_q, _quant_ref(k)[0]),
                                  leaf, c_out))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# ---------------------------------------------------- MXU row-mix (up2_impl)


def _requant_np(y):
    return np.clip(np.round(y), -127, 127).astype(np.int8)


@pytest.mark.parametrize("p,c,c_out,p_out,h,w,fold", [
    (2, 64, 64, 2, 8, 16, 1),      # db3.last-like
    (4, 64, 32, 4, 8, 16, 2),      # ub1.conv2-like (folded input rows)
])
def test_conv_prow_up2_mxu_exact(rng, p, c, c_out, p_out, h, w, fold):
    """The integer-exact MXU row-mix form (leaf carries 'rm'): bit-identical
    to up2_mxu_reference (the single-rounding rational interpolation)."""
    from sifsr_tpu.pallas.conv_px import up2_coeffs_mxu, up2_mxu_reference

    s_mid, s_up = 0.12, 0.2
    x_q, k, bias = _rand_case(rng, 2, h, w, c, c_out)
    leaf = prow_leaf(k, bias, p, s_in=0.17, s_out=s_mid)
    _, rm, cc, inv = up2_coeffs_mxu(h, w, c_out, s_mid, s_up)
    leaf.update(rm=jnp.asarray(rm), cc=jnp.asarray(cc), inv=jnp.asarray(inv))

    x_rows = nhwc_to_rows(x_q, p // fold)
    got = conv_prow_up2(x_rows, leaf, p, c, c_out, p_out, h, w, fold=fold,
                        interpret=True)

    qk, _ = _quant_ref(k)
    mid_nhwc = _requant(_ref_epilogue(_ref_conv_i32(x_q, qk), leaf, c_out))
    want = up2_mxu_reference(np.asarray(mid_nhwc), h, w, c_out, s_mid, s_up)

    inv_perm = np.argsort(np.asarray(up2_perm(p_out)))
    got = np.asarray(got).reshape(2, 2 * h, (2 * w) // p_out, p_out, c_out)
    got = got[:, :, :, inv_perm, :].reshape(2, 2 * h, 2 * w, c_out)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("h,n", [(16, 2), (32, 3)])
def test_conv_prow_up2_pack_mxu_exact(rng, h, n):
    """The serving-tail kernel in MXU row-mix form: bit-identical to
    up2_mxu_reference followed by the space-to-depth packing."""
    from sifsr_tpu.pallas.conv_px import (
        conv_prow_up2_pack, up2_coeffs_mxu, up2_mxu_reference)

    p, c = 8, 32
    s_mid, s_up = 0.15, 0.25
    x_q, k, bias = _rand_case(rng, n, h, h, c, 16)
    leaf = prow_leaf(k, bias, p, s_in=0.19, s_out=s_mid)
    _, rm, cc, inv = up2_coeffs_mxu(h, h, 16, s_mid, s_up)
    leaf.update(rm=jnp.asarray(rm), cc=jnp.asarray(cc), inv=jnp.asarray(inv))

    got = conv_prow_up2_pack(nhwc_to_rows(x_q, p // 2), leaf, p, c, h,
                             fold=2, interpret=True)
    got = np.asarray(got).reshape(n, h, h, 64)

    qk, _ = _quant_ref(k)
    mid_nhwc = _requant(_ref_epilogue(_ref_conv_i32(x_q, qk), leaf, 16))
    up = up2_mxu_reference(np.asarray(mid_nhwc), h, h, 16, s_mid, s_up)
    want = up.reshape(n, h, 2, h, 2, 16).transpose(0, 1, 3, 2, 4, 5).reshape(
        n, h, h, 64)
    np.testing.assert_array_equal(got, want)


def test_up2_mxu_matches_vpu_within_quantum(rng):
    """The two up2 factorizations compute the same rational interpolation
    with different rounding chains: outputs agree within 1 int8 quantum
    (the MXU form rounds exactly once and is the more accurate one)."""
    from sifsr_tpu.pallas.conv_px import up2_coeffs_mxu, up2_mxu_reference
    from sifsr_tpu.pallas.resize_phases import phases_to_nhwc, upsample_phases

    h = w = 16
    s_mid, s_up = 0.11, 0.23
    mid = rng.integers(-127, 128, (2, h, w, 8), dtype=np.int8)
    vpu = np.asarray(phases_to_nhwc(upsample_phases(
        jnp.asarray(mid), 2, "linear_ac", out_dtype=jnp.int8, scale=s_up,
        in_scale=s_mid, interpret=True)))
    mxu = up2_mxu_reference(mid, h, w, 8, s_mid, s_up)
    assert np.max(np.abs(vpu.astype(int) - mxu.astype(int))) <= 1
