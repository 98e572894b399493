"""Exact self-padding int8 Pallas pair-convs for the 256²-resolution layers.

Why: round 1's serving profile showed the C=16 convs at 256² dominating
device time — XLA's int8 conv at C=K=16 measures ~5.7% of v5e int8 peak
(MXU lanes mostly padding) and the quantize/pad elementwise passes add ~40%
step time on top. Round 2 additionally showed that EVERY XLA<->Pallas
boundary costs a 1-2 ms layout-conversion copy (XLA prefers batch-minor
layouts; custom calls pin {2,1,0}), so a layer must be ONE custom call with
zero XLA glue. Design:

- operate in the 2x2 space-to-depth packed domain (models/packed.py): a 3x3
  conv 16->16 @256² becomes a 3x3 conv 64->64 @128² — 4x the MACs but
  lane-dense, a large net win over the >8x lane waste of the unpacked form;
- tensors are *pixel-pair rows*: row r = (image row, pair) — 2 adjacent
  packed pixels x 64 channels = 128 lanes; the input is the UNPADDED packed
  tensor, a free reshape of (N, H, W, 64) int8;
- per slab the kernel loads V, builds the neighbour composite
  C = [roll(V,+1)[:,64:] | roll(V,-1)[:,:64]] (pixels 2b-1, 2b+2) with
  register rolls, and runs 2 fused K=384 int8 MXU matmuls (the 3 row taps
  lane-concatenated against (384, 128)-reshaped weights);
- replicate row pads are built IN-REGISTER at the first/last slab as lane
  permutations of the edge rows (P_top/P_bot matmuls), and the two wrong
  border column-pairs (roll wrap + packed-replicate column pad, landing
  exactly at pairs b=0 left half / b=W/2-1 right half) are fixed by ONE
  extra matmul corr = V @ P_fix selected by an iota%wb row mask — corners
  are automatically right because the phase-collapsing permutations
  commute. The kernel output is exact everywhere;
- the epilogue fuses dequantisation (per-lane scale), bias, ReLU and
  requantisation, so inter-layer tensors live in HBM as int8, and the in2
  layer emits the mid-chain phase mean as a fused second output (a 128x32
  int8 summing matmul on the requantized output — bit-identical to the XLA
  mean(s0p)*s_s0 path, quantizable to the consumer's int8 scale).

Reference anchors: the conv semantics are the BN-folded ModelB_2 convs
(reference model.py:85-159,608-645); exactness vs an int32-exact XLA
reference (all borders and corners) is asserted in
tests/test_conv_i8_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pack_row_tap_weights",
    "pack_outlay_weights",
    "conv_i8_exact",
    "conv_i8_exact_dual",
    "conv_i8_outlay",
    "conv_i8_in1",
    "conv_i8_in1_split",
    "in1_split_weights",
    "in1_pad_matrices_split",
    "pack_in1_weights",
    "in1_pad_matrices",
]


def pack_row_tap_weights(wq: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Packed int8 conv kernel (3, 3, 64, 64) -> (WM, WC), each (3, 128, 128).

    WM acts on the centre pair row (pixels 2b, 2b+1), WC on the neighbour
    composite (pixels 2b-1 | 2b+2). Lane layouts: rows h*64+c / out o*64+k."""
    wq = np.asarray(wq)
    assert wq.shape == (3, 3, 64, 64), wq.shape
    wm = np.zeros((3, 128, 128), wq.dtype)
    wc = np.zeros((3, 128, 128), wq.dtype)
    for h in range(2):
        for o in range(2):
            s = h - o + 1
            wm[:, h * 64 : (h + 1) * 64, o * 64 : (o + 1) * 64] = wq[:, s]
    wc[:, 0:64, 0:64] = wq[:, 0]      # px 2b-1 -> out o=0
    wc[:, 64:128, 64:128] = wq[:, 2]  # px 2b+2 -> out o=1
    return wm, wc


def _epilogue(yf, relu: bool, out_dtype):
    if relu:
        yf = jnp.maximum(yf, 0.0)
    if out_dtype == jnp.int8:
        return jnp.clip(jnp.round(yf), -127, 127).astype(jnp.int8)
    return yf.astype(out_dtype)


def _row_shift_down(v):
    """prev[r] = v[r-1] (wrapping) for an int8 (R, 128) value.

    Mosaic can't rotate sub-32-bit data, and bitcast to int32 packs 4
    *sublanes* (rows) per element — so a 1-row shift is an 8-bit byte shift
    within each packed uint32 plus a carry byte from the 4-row-granular
    roll. Row 4s+k lives in byte k (LSB = row 4s; verified by
    tests/test_conv_i8_pallas.py::test_row_shift_packing)."""
    v32 = pltpu.bitcast(v, jnp.uint32)
    carry = pltpu.roll(v32, 1, axis=0) >> 24
    return pltpu.bitcast((v32 << 8) | carry, jnp.int8)


def _row_shift_up(v):
    """nxt[r] = v[r+1] (wrapping) for an int8 (R, 128) value."""
    v32 = pltpu.bitcast(v, jnp.uint32)
    rows32 = v32.shape[0]
    carry = pltpu.roll(v32, rows32 - 1, axis=0) << 24
    return pltpu.bitcast((v32 >> 8) | carry, jnp.int8)


# ------------------------------------------------- v3: exact, self-padding
#
# The v2 layer above is exact only through an XLA wrapper (row-pad concat,
# border strip convs, paste concat) — profiled at ~30 ms/iter of pure copy
# glue in the composed serving step. v3 moves ALL padding and border handling
# in-kernel, so one layer is ONE custom call, int8 in -> int8 out, zero XLA
# glue:
#
# - top/bottom replicate-pad rows are lane permutations of the edge rows
#   (models/packed._pad_perms top/bottom), computed in-register as a matmul
#   with a 128x128 int8 permutation matrix (P_top/P_bot);
# - the two wrong border column-pairs (b=0 left half, b=wb-1 right half —
#   the roll wraps AND the packed-replicate column pad coincide there) are
#   fixed with ONE extra matmul corr = V @ P_fix: P_fix carries the
#   left-border permutation in lanes 0:64 and the right-border permutation
#   in lanes 64:128, and the two fixes apply at disjoint rows, selected by
#   an iota%wb row mask;
# - corner pads are automatically right: perm_top/bottom and perm_left/right
#   commute (both collapse a phase index), so fixing the composite of the
#   permuted pad row equals padding the fixed row;
# - the in2 layer's consumer (the mid-chain phase mean, an XLA reduce_sum +
#   convert over a 1 GB int8 tensor at batch 1024) can be fused as a second
#   output: mean over the 4 (q, r) phase slots of the REQUANTIZED int8
#   output via a 128x32 int8 summing matmul — bit-identical to the XLA
#   mean(s0p)*s_s0 path.
#
# Each slab is near memory-bound (~2 MB VMEM traffic vs ~1 µs of MXU work),
# so the extra permutation matmuls are free in wall-clock.


def border_fix_matrix(c: int = 16) -> np.ndarray:
    """(128, 128) int8: out lanes 0:64 = perm_left applied to the pair's
    first pixel (lanes 0:64), out lanes 64:128 = perm_right applied to the
    second pixel (lanes 64:128)."""
    from sifsr_tpu.models.packed import _pad_perms

    _, _, perm_left, perm_right = _pad_perms(c)
    p = np.zeros((8 * c, 8 * c), np.int8)
    for j in range(4 * c):
        p[perm_left[j], j] = 1
        p[4 * c + perm_right[j], 4 * c + j] = 1
    return p


def pad_row_matrices(c: int = 16) -> tuple[np.ndarray, np.ndarray]:
    """(P_top, P_bot), each (128, 128) int8: per-pixel phase permutation of a
    pair row implementing the packed replicate row pad."""
    from sifsr_tpu.models.packed import _pad_perms

    perm_top, perm_bottom, _, _ = _pad_perms(c)
    pt = np.zeros((8 * c, 8 * c), np.int8)
    pb = np.zeros((8 * c, 8 * c), np.int8)
    for px in range(2):
        o = 4 * c * px
        for j in range(4 * c):
            pt[o + perm_top[j], o + j] = 1
            pb[o + perm_bottom[j], o + j] = 1
    return pt, pb


def phase_mean_matrix(c: int = 16) -> np.ndarray:
    """(128, 32) int8 summing matrix: lane (px, q, r, ch) -> col px*c + ch,
    so y_i8 @ M sums the 4 phase slots of each of the pair's 2 pixels."""
    m = np.zeros((8 * c, 2 * c), np.int8)
    for px in range(2):
        for q in range(2):
            for r in range(2):
                for ch in range(c):
                    m[px * 4 * c + q * 2 * c + r * c + ch, px * c + ch] = 1
    return m


def phase_mean_matrix_rows(c: int = 16) -> np.ndarray:
    """(512, 128) block-diagonal phase_mean_matrix x4: four consecutive
    pair-rows lane-concatenated (the (R, 128) -> (R/4, 512) in-kernel
    reshape) map straight to one 128-lane p=8 rows-form phase-mean row —
    Mosaic rejects narrowing reshapes below 128 lanes, so the summing matmul
    does the regrouping instead."""
    m32 = phase_mean_matrix(c)
    m = np.zeros((512, 128), np.int8)
    for b in range(4):
        m[b * 128 : (b + 1) * 128, b * 32 : (b + 1) * 32] = m32
    return m


def _perm_dot(v, p_ref):
    """Apply a 128x128 int8 permutation matrix to int8 rows, exactly."""
    return jax.lax.dot_general(
        v, p_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.int8)


def _load_v_exact(x_ref, ptop_ref, pbot_ref, s, n_slabs, total, m, wb):
    """Slab input V ((m+2wb, 128) int8) with in-register replicate row pads
    at the first/last slab. x_ref block is the whole unpadded image
    (1, total, 128)."""
    row0 = pl.multiple_of(s * m, wb)
    top_start = pl.multiple_of(jnp.maximum(row0 - wb, 0), wb)
    bot_start = pl.multiple_of(jnp.minimum(row0 + m, total - wb), wb)
    top = x_ref[0, pl.ds(top_start, wb), :]
    top = jnp.where(s == 0, _perm_dot(x_ref[0, pl.ds(0, wb), :], ptop_ref), top)
    bot = x_ref[0, pl.ds(bot_start, wb), :]
    bot = jnp.where(s == n_slabs - 1,
                    _perm_dot(x_ref[0, pl.ds(total - wb, wb), :], pbot_ref), bot)
    mid = x_ref[0, pl.ds(row0, m), :]
    return jnp.concatenate([top, mid, bot], axis=0)


def _composite_exact(v, pfix_ref, wb):
    """Neighbour composite with the border column-pairs fixed in place."""
    m2 = v.shape[0]
    prev = _row_shift_down(v)
    nxt = _row_shift_up(v)
    comp = jnp.concatenate([prev[:, 64:128], nxt[:, 0:64]], axis=1)
    corr = _perm_dot(v, pfix_ref)
    b = jax.lax.broadcasted_iota(jnp.int32, (m2, 128), 0) % wb
    lane = jax.lax.broadcasted_iota(jnp.int32, (m2, 128), 1)
    mask = ((b == 0) & (lane < 64)) | ((b == wb - 1) & (lane >= 64))
    return jnp.where(mask, corr, comp)


def _dots(v, comp, wm_ref, wc_ref, m, wb):
    """2 fused K=384 matmuls instead of 6 K=128: the 3 tap slices are
    overlapping row-views lane-concatenated against the (384, 128)-reshaped
    weights — fewer, deeper MXU ops pipeline measurably better."""
    v3 = jnp.concatenate([v[0:m], v[wb : wb + m], v[2 * wb : 2 * wb + m]],
                         axis=1)
    c3 = jnp.concatenate([comp[0:m], comp[wb : wb + m],
                          comp[2 * wb : 2 * wb + m]], axis=1)
    ya = jax.lax.dot_general(v3, wm_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    yb = jax.lax.dot_general(c3, wc_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    return ya + yb


def _exact_kernel(x_ref, wm_ref, wc_ref, sc_ref, bias_ref, pfix_ref,
                  ptop_ref, pbot_ref, out_ref, *, relu, out_dtype, wb,
                  n_slabs, total, slab):
    s = pl.program_id(1)
    m = slab * wb
    v = _load_v_exact(x_ref, ptop_ref, pbot_ref, s, n_slabs, total, m, wb)
    comp = _composite_exact(v, pfix_ref, wb)
    y = _dots(v, comp, wm_ref, wc_ref, m, wb)
    yf = y.astype(jnp.float32) * sc_ref[0] + bias_ref[0]
    out_ref[0] = _epilogue(yf, relu, out_dtype)


def _exact_kernel_pm(x_ref, wm_ref, wc_ref, sc_ref, bias_ref, pfix_ref,
                     ptop_ref, pbot_ref, msum_ref, pm_scale_ref, out_ref,
                     pm_ref, *, relu, wb, n_slabs, total, pm_dtype, slab):
    """int8-out variant that also emits the phase mean of the requantized
    output (f32, 32 lanes = 2 px x 16 ch)."""
    s = pl.program_id(1)
    m = slab * wb
    v = _load_v_exact(x_ref, ptop_ref, pbot_ref, s, n_slabs, total, m, wb)
    comp = _composite_exact(v, pfix_ref, wb)
    y = _dots(v, comp, wm_ref, wc_ref, m, wb)
    yf = y.astype(jnp.float32) * sc_ref[0] + bias_ref[0]
    yq = _epilogue(yf, relu, jnp.int8)
    out_ref[0] = yq
    # emit in p=8 rows form (4 pair-rows -> one 128-lane row, lanes
    # (jp, px, ch)): the mid chain consumes this with zero relayout
    yq4 = yq.reshape(yq.shape[0] // 4, 512)
    pm = jax.lax.dot_general(yq4, msum_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    pmf = pm.astype(jnp.float32) * pm_scale_ref[0, 0]
    pm_ref[0] = _epilogue(pmf, False, pm_dtype)


def _exact_kernel_dual(x_ref, z_ref, wmx_ref, wcx_ref, wmz_ref, wcz_ref,
                       scx_ref, scz_ref, bias_ref, pfix_ref, ptop_ref,
                       pbot_ref, out_ref, *, relu, out_dtype, wb, n_slabs,
                       total, slab):
    s = pl.program_id(1)
    m = slab * wb
    vx = _load_v_exact(x_ref, ptop_ref, pbot_ref, s, n_slabs, total, m, wb)
    cx = _composite_exact(vx, pfix_ref, wb)
    yx = _dots(vx, cx, wmx_ref, wcx_ref, m, wb)
    vz = _load_v_exact(z_ref, ptop_ref, pbot_ref, s, n_slabs, total, m, wb)
    cz = _composite_exact(vz, pfix_ref, wb)
    yz = _dots(vz, cz, wmz_ref, wcz_ref, m, wb)
    yf = (yx.astype(jnp.float32) * scx_ref[0]
          + yz.astype(jnp.float32) * scz_ref[0] + bias_ref[0])
    out_ref[0] = _epilogue(yf, relu, out_dtype)


EXACT_SLAB = 64  # output image-rows per grid step (grid-step overhead
                 # dominates below this; VMEM bounds it above)


def _exact_slab(hp: int) -> int:
    return hp if hp <= EXACT_SLAB else EXACT_SLAB


def _exact_specs(n, hp, wb, slab):
    img = pl.BlockSpec((1, hp * wb, 128), lambda i, s: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    w = pl.BlockSpec((384, 128), lambda i, s: (0, 0),
                     memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, 128), lambda i, s: (0, 0), memory_space=pltpu.VMEM)
    perm = pl.BlockSpec((128, 128), lambda i, s: (0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, slab * wb, 128), lambda i, s: (i, s, 0),
                       memory_space=pltpu.VMEM)
    return img, w, vec, perm, out


def _perm_consts(dtype=jnp.int8):
    pf = jnp.asarray(border_fix_matrix())
    pt, pb = pad_row_matrices()
    return pf, jnp.asarray(pt), jnp.asarray(pb)


@functools.partial(
    jax.jit,
    static_argnames=("hp", "wp", "relu", "out_dtype", "pm_dtype", "pm_rows",
                     "slab", "interpret"),
)
def conv_i8_exact(x_packed, wm, wc, scale, bias, hp: int, wp: int,
                  relu: bool = True, out_dtype=jnp.int8,
                  phase_mean=None, pm_dtype=jnp.float32,
                  pm_rows: bool = False, slab: int | None = None,
                  interpret: bool = False):
    """Exact packed-domain 3x3 conv 64->64 in one custom call.

    x_packed: (N, hp, wp, 64) int8, UNPADDED; returns (N, hp, wp, 64)
    out_dtype (+ the phase mean if phase_mean is the dequant scale s_out).
    The phase mean is computed in the kernel in p=8 rows form
    ((N, hp*wp/8, 128), lanes (jp, px, ch) — the mid chain's conv_prow
    input layout, zero glue); pm_rows=False reshapes it to the NHWC-view
    (N, hp, wp/2, 32) for the XLA-mid consumers."""
    n = x_packed.shape[0]
    wb = wp // 2
    slab = slab or _exact_slab(hp)   # whole-image (hp) measures ~8% faster
    assert hp % slab == 0 and wb % 8 == 0, (hp, wp)   # where VMEM allows
    x_rows = x_packed.reshape(n, hp * wb, 128)
    img, w, vec, perm, out = _exact_specs(n, hp, wb, slab)
    pf, pt, pb = _perm_consts()
    n_slabs = hp // slab
    total = hp * wb
    if phase_mean is None:
        kern = functools.partial(_exact_kernel, relu=relu, out_dtype=out_dtype,
                                 wb=wb, n_slabs=n_slabs, total=total, slab=slab)
        y = pl.pallas_call(
            kern,
            grid=(n, n_slabs),
            in_specs=[img, w, w, vec, vec, perm, perm, perm],
            out_specs=out,
            out_shape=jax.ShapeDtypeStruct((n, total, 128), out_dtype),
            interpret=interpret,
        )(x_rows, wm.reshape(384, 128), wc.reshape(384, 128),
          scale.reshape(1, 128), bias.reshape(1, 128), pf, pt, pb)
        return y.reshape(n, hp, wp, 64)
    kern = functools.partial(_exact_kernel_pm, relu=relu, wb=wb,
                             n_slabs=n_slabs, total=total, pm_dtype=pm_dtype,
                             slab=slab)
    msum = pl.BlockSpec((512, 128), lambda i, s: (0, 0), memory_space=pltpu.VMEM)
    pm_sc = pl.BlockSpec((1, 1), lambda i, s: (0, 0), memory_space=pltpu.SMEM)
    pm_out = pl.BlockSpec((1, slab * wb // 4, 128), lambda i, s: (i, s, 0),
                          memory_space=pltpu.VMEM)
    y, pm = pl.pallas_call(
        kern,
        grid=(n, n_slabs),
        in_specs=[img, w, w, vec, vec, perm, perm, perm, msum, pm_sc],
        out_specs=(out, pm_out),
        out_shape=(jax.ShapeDtypeStruct((n, total, 128), jnp.int8),
                   jax.ShapeDtypeStruct((n, total // 4, 128), pm_dtype)),
        interpret=interpret,
    )(x_rows, wm.reshape(384, 128), wc.reshape(384, 128),
      scale.reshape(1, 128), bias.reshape(1, 128),
      pf, pt, pb, jnp.asarray(phase_mean_matrix_rows()),
      jnp.full((1, 1), phase_mean / 4.0, jnp.float32))
    if pm_rows:
        return y.reshape(n, hp, wp, 64), pm
    return y.reshape(n, hp, wp, 64), pm.reshape(n, hp, wb, 32)


@functools.partial(
    jax.jit, static_argnames=("hp", "wp", "relu", "out_dtype", "interpret")
)
def conv_i8_exact_dual(x_packed, z_packed, wmx, wcx, wmz, wcz, scale_x,
                       scale_z, bias, hp: int, wp: int, relu: bool = True,
                       out_dtype=jnp.int8, interpret: bool = False):
    """Exact skip-concat conv: conv(concat(x, z)) = conv_x(x) + conv_z(z),
    both inputs unpadded (N, hp, wp, 64) int8, one custom call."""
    n = x_packed.shape[0]
    wb = wp // 2
    slab = _exact_slab(hp)
    assert hp % slab == 0 and wb % 8 == 0, (hp, wp)
    img, w, vec, perm, out = _exact_specs(n, hp, wb, slab)
    pf, pt, pb = _perm_consts()
    kern = functools.partial(_exact_kernel_dual, relu=relu, out_dtype=out_dtype,
                             wb=wb, n_slabs=hp // slab, total=hp * wb, slab=slab)
    y = pl.pallas_call(
        kern,
        grid=(n, hp // slab),
        in_specs=[img, img, w, w, w, w, vec, vec, vec, perm, perm, perm],
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((n, hp * wb, 128), out_dtype),
        interpret=interpret,
    )(x_packed.reshape(n, hp * wb, 128), z_packed.reshape(n, hp * wb, 128),
      wmx.reshape(384, 128), wcx.reshape(384, 128),
      wmz.reshape(384, 128), wcz.reshape(384, 128),
      scale_x.reshape(1, 128), scale_z.reshape(1, 128),
      bias.reshape(1, 128), pf, pt, pb)
    return y.reshape(n, hp, wp, 64)


# ------------------------------------------------------ outlay (64 -> 4) tail
#
# The final 3x3 conv 16->1 (reference model.py:605) in packed form is a 3x3
# conv 64->4 at 128². Rounds 2-3 ran it as an XLA int8 conv, which (a) forced
# a batch-minor relayout of ub3.conv2's 1 MB/image int8 output (copy.140,
# ~1.6 ms/iter at batch 384) and (b) needed 4 border-strip convs + dynamic
# slice pastes for the exact replicate pad. This kernel consumes the pair
# rows pallas-to-pallas (copy-free), handles the replicate pad exactly with
# the same in-register machinery as conv_i8_exact, and fuses the dequant +
# Kelvin de-normalise epilogue; only the f32 fine-pixel transpose (4x fewer
# bytes than the int8 relayout) is left to XLA.


def pack_outlay_weights(wq: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Packed int8 outlay kernel (3, 3, 64, 4) -> (WM, WC), each (3, 128, 8):
    same banding as pack_row_tap_weights with c_out = 4 per pixel."""
    wq = np.asarray(wq)
    assert wq.shape == (3, 3, 64, 4), wq.shape
    wm = np.zeros((3, 128, 8), wq.dtype)
    wc = np.zeros((3, 128, 8), wq.dtype)
    for h in range(2):
        for o in range(2):
            s = h - o + 1
            if abs(h - o) <= 1:
                wm[:, h * 64 : (h + 1) * 64, o * 4 : (o + 1) * 4] = wq[:, s]
    wc[:, 0:64, 0:4] = wq[:, 0]       # px 2b-1 -> out o=0
    wc[:, 64:128, 4:8] = wq[:, 2]     # px 2b+2 -> out o=1
    return wm, wc


def _outlay_kernel(x_ref, wm_ref, wc_ref, sc_ref, bias_ref, pfix_ref,
                   ptop_ref, pbot_ref, out_ref, *, wb, n_slabs, total, slab):
    s = pl.program_id(1)
    m = slab * wb
    v = _load_v_exact(x_ref, ptop_ref, pbot_ref, s, n_slabs, total, m, wb)
    comp = _composite_exact(v, pfix_ref, wb)
    y = _dots(v, comp, wm_ref, wc_ref, m, wb)        # (m, 8) int32
    out_ref[0] = y.astype(jnp.float32) * sc_ref[0] + bias_ref[0]


@functools.partial(jax.jit, static_argnames=("hp", "wp", "slab", "interpret"))
def conv_i8_outlay(x_packed, wm, wc, scale, bias, hp: int, wp: int,
                   slab: int | None = None, interpret: bool = False):
    """The serving tail's outlay conv in one custom call: unpadded
    (N, hp, wp, 64) int8 pair rows -> (N, hp*wp/2, 8) f32, lanes
    (px, q, r) = the 2x2 fine phases of the row's two packed pixels, scale/
    bias (8,) carrying the dequant + Kelvin de-normalise. Exact replicate
    borders (no strip pastes). The fine SR is
    out.reshape(n, hp, wb, 2, 2, 2).transpose(0, 1, 4, 2, 3, 5) -> (2hp, 2wp)."""
    n = x_packed.shape[0]
    wb = wp // 2
    slab = slab or _exact_slab(hp)
    assert hp % slab == 0 and wb % 8 == 0, (hp, wp)
    img, w, vec, perm, _ = _exact_specs(n, hp, wb, slab)
    w8 = pl.BlockSpec((384, 8), lambda i, s: (0, 0), memory_space=pltpu.VMEM)
    vec8 = pl.BlockSpec((1, 8), lambda i, s: (0, 0), memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, slab * wb, 8), lambda i, s: (i, s, 0),
                       memory_space=pltpu.VMEM)
    pf, pt, pb = _perm_consts()
    kern = functools.partial(_outlay_kernel, wb=wb, n_slabs=hp // slab,
                             total=hp * wb, slab=slab)
    return pl.pallas_call(
        kern,
        grid=(n, hp // slab),
        in_specs=[img, w8, w8, vec8, vec8, perm, perm, perm],
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((n, hp * wb, 8), jnp.float32),
        interpret=interpret,
    )(x_packed.reshape(n, hp * wb, 128), wm.reshape(384, 8),
      wc.reshape(384, 8), scale.reshape(1, 8), bias.reshape(1, 8), pf, pt, pb)


# --------------------------------------------- in1: 8-ch packed 3x3 in-kernel
#
# inbloc.conv1 (reference model.py:596, the 2->16 fine conv) in packed form is
# a 3x3 conv 8->64 at 128². Round 2 served it as conv_i8_prestacked with XLA
# lane-stacking the 3x3 neighbourhood — profiled at ~5.9 ms/iter of concat +
# relayout copies at batch 256 (the x144 tensor is 4.5x the input bytes and
# XLA materialises it twice). v3: the tap stack is built IN-KERNEL from
# 16-pixel rows (lanes = 16 px x 8 ch = 128), so the layer reads the packed
# input once and is one custom call:
#
# - input rows r = (image row i, 16-px group g), lanes (px, q, r, c) with the
#   packed channel order of models/packed._space_to_depth;
# - vertical taps via the int32-packed row shifts (+-gpi), with the packed
#   replicate row pad applied in-register as a phase permutation matmul
#   (P_top/P_bot on (px, q->0/1, r, c) lanes);
# - horizontal neighbours beyond the 16-px group (px -1 / px 16) come from
#   the +-1 row shifts' edge pixels; at image borders they are replaced by
#   the packed replicate column pad (r->0/1 phase permutation, P_edge);
# - one K=432 int8 matmul ([3 tap rows | 3 tap composites] x (432, 1024))
#   computes all 8 output pixel-pairs of the group; the epilogue requantizes
#   and emits pixel-pair rows (R*8, 128) via an in-register reshape, feeding
#   conv_i8_exact (in2) pallas-to-pallas with zero XLA glue.


def in1_pad_matrices() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(P_top, P_bot, P_edge) for the 16-px 8-ch rows: P_top/P_bot are
    (128, 128) phase permutations of a whole row (packed replicate row pad,
    models/packed._pad_perms with c=2); P_edge (128, 16) emits
    [left-pad px (8) | right-pad px (8)]: the left pad pixel is px 0 with
    r->0, the right pad pixel is px 15 with r->1."""
    pt = np.zeros((128, 128), np.int8)
    pb = np.zeros((128, 128), np.int8)
    pe = np.zeros((128, 16), np.int8)
    for px in range(16):
        for q in range(2):
            for r in range(2):
                for w in range(2):
                    dst = px * 8 + q * 4 + r * 2 + w
                    pt[px * 8 + 0 * 4 + r * 2 + w, dst] = 1
                    pb[px * 8 + 1 * 4 + r * 2 + w, dst] = 1
    for q in range(2):
        for w in range(2):
            for r in range(2):
                pe[0 * 8 + q * 4 + 0 * 2 + w, q * 4 + r * 2 + w] = 1
                pe[15 * 8 + q * 4 + 1 * 2 + w, 8 + q * 4 + r * 2 + w] = 1
    return pt, pb, pe


def pack_in1_weights(q1: np.ndarray) -> np.ndarray:
    """Packed int8 conv kernel (3, 3, 8, 64) -> (432, 1024) for conv_i8_in1.

    Input lanes: [tap0 row (128) | tap1 | tap2 | tap0 comp (16 = prev px |
    next px) | tap1 comp | tap2 comp]; output lanes (o-pair 8, px 2, ch 64)."""
    q1 = np.asarray(q1)
    assert q1.shape == (3, 3, 8, 64), q1.shape
    w = np.zeros((432, 1024), q1.dtype)
    for o in range(8):
        for opx in range(2):
            col = (o * 2 + opx) * 64
            out_px = 2 * o + opx
            for dh in range(3):
                for dw in range(3):
                    p = out_px + dw - 1
                    if 0 <= p < 16:
                        w[dh * 128 + p * 8 : dh * 128 + (p + 1) * 8,
                          col : col + 64] = q1[dh, dw]
                    elif p == -1:       # prev-group px 15 / left pad
                        w[384 + dh * 16 : 384 + dh * 16 + 8,
                          col : col + 64] = q1[dh, 0]
                    else:               # p == 16: next-group px 0 / right pad
                        w[384 + dh * 16 + 8 : 384 + dh * 16 + 16,
                          col : col + 64] = q1[dh, 2]
    return w


def _in1_kernel(x_ref, w_ref, sc_ref, b_ref, pt_ref, pb_ref, pe_ref, out_ref,
                *, gpi, h, relu, out_dtype):
    from sifsr_tpu.pallas.conv_px import _shift_rows  # no import cycle: conv_px is self-contained

    v = x_ref[0]                                   # (h*gpi, 128) int8
    rows = v.shape[0]
    rr = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    gidx, iidx = rr % gpi, rr // gpi

    up = _shift_rows(v, -gpi)
    dn = _shift_rows(v, gpi)
    top = jnp.where(iidx == 0, _perm_dot(v, pt_ref), up)
    bot = jnp.where(iidx == h - 1, _perm_dot(v, pb_ref), dn)

    def comp(t):
        edge = jax.lax.dot_general(
            t, pe_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.int8)
        prev = jnp.where(gidx == 0, edge[:, 0:8],
                         _shift_rows(t, -1)[:, 120:128])
        nxt = jnp.where(gidx == gpi - 1, edge[:, 8:16],
                        _shift_rows(t, 1)[:, 0:8])
        return jnp.concatenate([prev, nxt], axis=1)

    x_full = jnp.concatenate(
        [top, v, bot, comp(top), comp(v), comp(bot)], axis=1)   # (R, 432)
    y = jax.lax.dot_general(x_full, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    yf = y.astype(jnp.float32) * sc_ref[0] + b_ref[0]
    out_ref[0] = _epilogue(yf, relu, out_dtype).reshape(out_ref.shape[1:])


@functools.partial(
    jax.jit, static_argnames=("h", "w", "relu", "out_dtype", "interpret")
)
def conv_i8_in1(xq, w432, scale, bias, h: int, w: int, relu: bool = True,
                out_dtype=jnp.int8, interpret: bool = False):
    """Packed-domain 3x3 conv 8->64 in one custom call, emitting pair rows.

    xq: (N, h, w, 8) int8 packed input (channel order (q, r, c) of
    models/packed._space_to_depth), UNPADDED. Returns (N, h*w/2, 128) int8
    pixel-pair rows (= conv_i8_exact's input form; reshape to (N, h, w, 64)
    is free). w432 from pack_in1_weights; scale/bias are the 128-lane
    (px, ch) vectors tiled x8 to 1024 lanes by the caller."""
    n = xq.shape[0]
    assert xq.shape[1] == h and xq.shape[2] == w and xq.shape[3] == 8
    assert w % 16 == 0, w
    gpi = w // 16
    rows = h * gpi
    x_rows = xq.reshape(n, rows, 128)
    pt, pb, pe = in1_pad_matrices()
    kern = functools.partial(_in1_kernel, gpi=gpi, h=h, relu=relu,
                             out_dtype=out_dtype)
    y = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((432, 1024), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1024), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1024), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows * 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, rows * 8, 128), out_dtype),
        interpret=interpret,
    )(x_rows, w432, scale.reshape(1, 1024), bias.reshape(1, 1024),
      jnp.asarray(pt), jnp.asarray(pb), jnp.asarray(pe))
    return y


def in1_pad_matrices_split() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad matrices for conv_i8_in1_split's half-split row lane order
    [lst (px, q, r) 64 | ndvi (px, q, r) 64]: P_top/P_bot (128, 128)
    block-diagonal phase permutations, P_edge (128, 16) emitting
    [left-pad px (c, q, r) 8 | right-pad px 8]."""
    pt = np.zeros((128, 128), np.int8)
    pb = np.zeros((128, 128), np.int8)
    pe = np.zeros((128, 16), np.int8)
    for c in range(2):
        o = c * 64
        for px in range(16):
            for q in range(2):
                for r in range(2):
                    dst = o + px * 4 + q * 2 + r
                    pt[o + px * 4 + 0 * 2 + r, dst] = 1
                    pb[o + px * 4 + 1 * 2 + r, dst] = 1
        for q in range(2):
            for r in range(2):
                pe[o + 0 * 4 + q * 2 + 0, c * 4 + q * 2 + r] = 1      # left
                pe[o + 15 * 4 + q * 2 + 1, 8 + c * 4 + q * 2 + r] = 1  # right
    return pt, pb, pe


def in1_split_weights(w432: np.ndarray) -> np.ndarray:
    """Row-permute pack_in1_weights output for the split-source K order:
    tap rows (dh, px, qr*2+c) -> (dh, c, px, qr); composite rows
    (dh, side, qr*2+c) -> (dh, side, c, qr)."""
    w432 = np.asarray(w432)
    perm = np.zeros(432, np.int64)
    for dh in range(3):
        for p in range(16):
            for ch8 in range(8):
                qr, c = ch8 // 2, ch8 % 2
                perm[dh * 128 + c * 64 + p * 4 + qr] = dh * 128 + p * 8 + ch8
        for side in range(2):
            for ch8 in range(8):
                qr, c = ch8 // 2, ch8 % 2
                perm[384 + dh * 16 + side * 8 + c * 4 + qr] = (
                    384 + dh * 16 + side * 8 + ch8)
    return w432[perm]


def _in1_kernel_split(l_ref, nd_ref, w_ref, sc_ref, b_ref, pt_ref, pb_ref,
                      pe_ref, out_ref, *, gpi, h, relu, out_dtype):
    from sifsr_tpu.pallas.conv_px import _shift_rows

    # one lane concat -> the rest of the assembly runs single-width on the
    # half-split 128-lane rows (a first attempt that kept the halves
    # separate doubled every shift/perm op and measured ~0.7 ms/iter SLOWER
    # than the XLA-interleaved single-ref form at batch 256)
    v = jnp.concatenate([l_ref[0], nd_ref[0]], axis=1)   # (R, 128)
    rows = v.shape[0]
    rr = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    gidx, iidx = rr % gpi, rr // gpi

    top = jnp.where(iidx == 0, _perm_dot(v, pt_ref), _shift_rows(v, -gpi))
    bot = jnp.where(iidx == h - 1, _perm_dot(v, pb_ref), _shift_rows(v, gpi))

    def comp(t):                                   # (R, 128) -> (R, 16)
        edge = jax.lax.dot_general(
            t, pe_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.int8)
        sp = _shift_rows(t, -1)                    # px 15: lanes 60:64/124:128
        prev = jnp.where(gidx == 0, edge[:, 0:8],
                         jnp.concatenate([sp[:, 60:64], sp[:, 124:128]], 1))
        sn = _shift_rows(t, 1)                     # px 0: lanes 0:4/64:68
        nxt = jnp.where(gidx == gpi - 1, edge[:, 8:16],
                        jnp.concatenate([sn[:, 0:4], sn[:, 64:68]], 1))
        return jnp.concatenate([prev, nxt], axis=1)

    x_full = jnp.concatenate(
        [top, v, bot, comp(top), comp(v), comp(bot)], axis=1)  # (R, 432)
    y = jax.lax.dot_general(x_full, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    yf = y.astype(jnp.float32) * sc_ref[0] + b_ref[0]
    out_ref[0] = _epilogue(yf, relu, out_dtype).reshape(out_ref.shape[1:])


@functools.partial(
    jax.jit, static_argnames=("h", "w", "relu", "out_dtype", "interpret")
)
def conv_i8_in1_split(lst4, ndvi4, w432s, scale, bias, h: int, w: int,
                      relu: bool = True, out_dtype=jnp.int8,
                      interpret: bool = False):
    """conv_i8_in1 with the two packed sources as SEPARATE refs: the K-concat
    happens in-register, so the serving step's XLA channel-interleave chain
    (5D reshape + concat + squeeze, ~0.5 ms/iter at batch 256) disappears.

    lst4/ndvi4: (N, h, w, 4) int8, lanes (q, r) per packed px
    (models/packed._space_to_depth single-source order). w432s from
    in1_split_weights(pack_in1_weights(q1)). Output identical to
    conv_i8_in1 on the interleaved concat: (N, h*w/2, 128) int8 pair rows."""
    n = lst4.shape[0]
    assert lst4.shape == (n, h, w, 4) and ndvi4.shape == (n, h, w, 4)
    assert w % 16 == 0, w
    gpi = w // 16
    rows = h * gpi
    l_rows = lst4.reshape(n, rows, 64)
    n_rows = ndvi4.reshape(n, rows, 64)
    pt, pb, pe = in1_pad_matrices_split()
    kern = functools.partial(_in1_kernel_split, gpi=gpi, h=h, relu=relu,
                             out_dtype=out_dtype)
    half = pl.BlockSpec((1, rows, 64), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            half, half,
            pl.BlockSpec((432, 1024), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1024), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1024), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows * 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, rows * 8, 128), out_dtype),
        interpret=interpret,
    )(l_rows, n_rows, w432s, scale.reshape(1, 1024), bias.reshape(1, 1024),
      jnp.asarray(pt), jnp.asarray(pb), jnp.asarray(pe))
