"""Fused int8 Pallas conv for the 256²-resolution U-Net layers.

Why: profiling round 1's serving step showed the C=16 convs at 256² dominate
device time. XLA's int8 conv at C=K=16 measures ~5.7% of v5e int8 peak (the
MXU contraction/output lanes are mostly padding), and the surrounding
quantize/pad/dequant elementwise passes add ~40% step time on top
(FUTURE.md round-1 profile).

The kernel reformulates the conv so the MXU runs dense:

- operate in the 2x2 space-to-depth packed domain (models/packed.py): a 3x3
  conv 16->16 @256² becomes a 3x3 conv 64->64 @128² (4x the MACs, but
  lane-dense — net win because the unpacked form wastes >8x on lanes);
- packed tensors are stored as *pixel-pair rows*: one row = 2 adjacent
  packed pixels x 64 channels = 128 lanes exactly;
- producing one output pair needs 4 input pixels (2b-1..2b+2 in padded
  coordinates: 2b..2b+3) per kernel row tap P — i.e. input pair b and pair
  b+1. The host/XLA side supplies the padded image twice: ``xp_a`` = pairs
  (2b, 2b+1) and ``xp_b`` = pairs (2b+2, 2b+3), both (N, (H+2)*W/2, 128)
  int8 (just two static slices of the padded tensor, no gathers). Every
  kernel access is then a whole (M=slab*W/2, 128) row block at an offset
  that is a multiple of W/2 — Mosaic-aligned with zero in-kernel copies;
- the conv itself is 6 dense int8 MXU matmuls per slab,
      Y = sum_P  A_P @ Wa_P  +  B_P @ Wb_P,     (M,128)@(128,128)->int32
  where A_P/B_P are row-shifted slices of xp_a/xp_b and the (128,128) tap
  weights Wa_P[(u*64+c), (o*64+k)] = w_packed[P, u-o, c, k] (u-o in {0,1,2},
  75% dense) come from ``pack_tap_weights``. MXU utilisation bound: 0.75 vs
  XLA's measured ~0.06 on the unpacked conv;
- the epilogue fuses dequantisation (per-lane combined scale), bias, ReLU
  and requantisation to the *next* layer's int8 scale, so inter-layer
  tensors live in HBM as int8 and no separate quantize/pad/dequant passes
  exist at 256² at all.

Padding uses the packed-replicate semantics of models/packed.py (the pad
pixel replicates the outermost *original* row/col into both phase slots) —
applied once in XLA on the int8 tensor.

Reference anchors: the conv semantics being accelerated are the BN-folded
ModelB_2 convs (reference model.py:85-159,608-645) as quantized in
models/quantized_packed.py; equivalence is asserted in
tests/test_conv_i8_pallas.py against that path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pack_tap_weights",
    "pairs_ab_from_padded",
    "packed_from_pairs",
    "conv_i8_pairs",
    "conv_i8_pairs_dual",
]

SLAB = 16  # output image-rows per grid step


def pack_tap_weights(wq: np.ndarray) -> np.ndarray:
    """Packed int8 conv kernel (3, 3, Cp, Kp) -> per-(row-tap, pair-half)
    matmul weights (3, 2, 2*Cp, 2*Kp):

        W[P, u, h*Cp + c, o*Kp + k] = wq[P, (2u + h) - o, c, k]

    (zero where the column tap (2u+h)-o leaves {0,1,2}). Half u=0 multiplies
    the ``xp_a`` pair (padded px 2b, 2b+1), half u=1 the ``xp_b`` pair
    (padded px 2b+2, 2b+3); o indexes the two output pixels of the pair."""
    wq = np.asarray(wq)
    assert wq.shape[:2] == (3, 3), wq.shape
    cp, kp = wq.shape[2], wq.shape[3]
    out = np.zeros((3, 2, 2 * cp, 2 * kp), wq.dtype)
    for u in range(2):
        for h in range(2):
            for o in range(2):
                s = 2 * u + h - o
                if 0 <= s <= 2:
                    out[:, u, h * cp : (h + 1) * cp, o * kp : (o + 1) * kp] = wq[:, s]
    return out


def pairs_ab_from_padded(xpad: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Padded packed tensor (N, H+2, W+2, 64) -> the two pair-row tensors
    (N, (H+2)*W/2, 128): xp_a = pixel pairs (2b, 2b+1), xp_b = (2b+2, 2b+3),
    b in [0, W/2)."""
    n, h2, w2, c = xpad.shape
    assert c == 64 and w2 % 2 == 0, (c, w2)
    w = w2 - 2
    xp_a = xpad[:, :, : w, :].reshape(n, h2 * (w // 2), 2 * c)
    xp_b = xpad[:, :, 2:, :].reshape(n, h2 * (w // 2), 2 * c)
    return xp_a, xp_b


def packed_from_pairs(y: jnp.ndarray, hp: int, wp: int, kp: int = 64) -> jnp.ndarray:
    """Pair rows (N, hp*wp/2, 2*kp) -> packed (N, hp, wp, kp)."""
    n = y.shape[0]
    return y.reshape(n, hp, wp, kp)


def _epilogue(yf, relu: bool, out_dtype):
    if relu:
        yf = jnp.maximum(yf, 0.0)
    if out_dtype == jnp.int8:
        return jnp.clip(jnp.round(yf), -127, 127).astype(jnp.int8)
    return yf.astype(out_dtype)


def _taps_dot(xa_ref, xb_ref, w_ref, row0, m, wb):
    """sum_P xa[rows+P*wb] @ w[P,0] + xb[rows+P*wb] @ w[P,1], int32."""
    y = None
    for p in range(3):
        off = pl.multiple_of(row0 + p * wb, wb)
        ya = jax.lax.dot_general(
            xa_ref[0, pl.ds(off, m), :], w_ref[p, 0],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        yb = jax.lax.dot_general(
            xb_ref[0, pl.ds(off, m), :], w_ref[p, 1],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        y = ya + yb if y is None else y + ya + yb
    return y


def _conv_kernel(xa_ref, xb_ref, w_ref, sc_ref, bias_ref, out_ref, *,
                 relu, out_dtype, wb):
    s = pl.program_id(1)
    row0 = s * (SLAB * wb)
    y = _taps_dot(xa_ref, xb_ref, w_ref, row0, SLAB * wb, wb)
    yf = y.astype(jnp.float32) * sc_ref[0] + bias_ref[0]
    out_ref[0] = _epilogue(yf, relu, out_dtype)


def _conv_kernel_dual(xa_ref, xb_ref, za_ref, zb_ref, w_ref, v_ref,
                      sca_ref, scb_ref, bias_ref, out_ref, *,
                      relu, out_dtype, wb):
    s = pl.program_id(1)
    row0 = s * (SLAB * wb)
    m = SLAB * wb
    y1 = _taps_dot(xa_ref, xb_ref, w_ref, row0, m, wb)
    y2 = _taps_dot(za_ref, zb_ref, v_ref, row0, m, wb)
    yf = (y1.astype(jnp.float32) * sca_ref[0]
          + y2.astype(jnp.float32) * scb_ref[0] + bias_ref[0])
    out_ref[0] = _epilogue(yf, relu, out_dtype)


@functools.partial(
    jax.jit, static_argnames=("hp", "wp", "relu", "out_dtype", "interpret")
)
def conv_i8_pairs(xp_a, xp_b, w_taps, scale, bias, hp: int, wp: int,
                  relu: bool = True, out_dtype=jnp.int8, interpret: bool = False):
    """Packed-domain 3x3 conv, 64 -> 64 channels, pixel-pair layout.

    xp_a, xp_b: (N, (hp+2)*wp/2, 128) int8 from pairs_ab_from_padded;
    w_taps: (3, 2, 128, 128) int8 from pack_tap_weights;
    scale: (128,) f32 — s_in * s_w[k] (* 1/s_out when out_dtype=int8), lane
        layout (o*64 + k); bias likewise folded;
    returns pair rows (N, hp*wp/2, 128) of out_dtype.
    """
    n = xp_a.shape[0]
    wb = wp // 2
    assert hp % SLAB == 0 and wb % 8 == 0, (hp, wp)
    n_slabs = hp // SLAB
    pad_rows = (hp + 2) * wb
    kern = functools.partial(_conv_kernel, relu=relu, out_dtype=out_dtype, wb=wb)
    img_spec = pl.BlockSpec((1, pad_rows, 128), lambda i, s: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, 128), lambda i, s: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n, n_slabs),
        in_specs=[
            img_spec,
            img_spec,
            pl.BlockSpec((3, 2, 128, 128), lambda i, s: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            v_spec,
            v_spec,
        ],
        out_specs=pl.BlockSpec((1, SLAB * wb, 128), lambda i, s: (i, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp * wb, 128), out_dtype),
        interpret=interpret,
    )(xp_a, xp_b, w_taps, scale.reshape(1, 128), bias.reshape(1, 128))


@functools.partial(
    jax.jit, static_argnames=("hp", "wp", "relu", "out_dtype", "interpret")
)
def conv_i8_pairs_dual(xa, xb, za, zb, w_taps, v_taps, scale_a, scale_b,
                       bias, hp: int, wp: int, relu: bool = True,
                       out_dtype=jnp.int8, interpret: bool = False):
    """conv(concat(x, z)) = conv_x(x) + conv_z(z): the skip-concat conv
    (ub3.conv1) without materialising the 128-channel concat. Each input is
    its own 64-channel packed pair tensor pair (a/b halves) with its own
    input scale folded into scale_a/scale_b."""
    n = xa.shape[0]
    wb = wp // 2
    assert hp % SLAB == 0 and wb % 8 == 0, (hp, wp)
    n_slabs = hp // SLAB
    pad_rows = (hp + 2) * wb
    kern = functools.partial(_conv_kernel_dual, relu=relu, out_dtype=out_dtype, wb=wb)
    img_spec = pl.BlockSpec((1, pad_rows, 128), lambda i, s: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((3, 2, 128, 128), lambda i, s: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, 128), lambda i, s: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n, n_slabs),
        in_specs=[img_spec, img_spec, img_spec, img_spec, w_spec, w_spec,
                  v_spec, v_spec, v_spec],
        out_specs=pl.BlockSpec((1, SLAB * wb, 128), lambda i, s: (i, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp * wb, 128), out_dtype),
        interpret=interpret,
    )(xa, xb, za, zb, w_taps, v_taps,
      scale_a.reshape(1, 128), scale_b.reshape(1, 128), bias.reshape(1, 128))
