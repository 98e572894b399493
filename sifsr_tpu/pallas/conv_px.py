"""Generalized p-pixel-row exact int8 Pallas convs — the U-Net mid chain.

Round 2 left the serving step ~31% short of the 10k patches/s north star
with a measured split (batch 256, 37.6 ms/iter): pallas 256²-level kernels
9.7 ms, XLA<->Pallas layout copies ~13 ms, XLA int8 mid chain ~12.7 ms (of
which ~5.5 ms is pure quantize/dequantize elementwise traffic around XLA's
convs). This module moves the mid chain (db1..db3, ub1, ub2 — reference
model.py:596-604, the blocks between `inbloc` and `ub3`) into Pallas so the
whole serving graph is custom calls + thin int8 reshape glue.

Design (generalizes pallas/conv_i8.py's pixel-pair rows):

- a (H, W, C) int8 tensor lives as rows (H * W/p, p*C): row r = (image row
  i, pixel group g) = p adjacent pixels x C channels; p is chosen so the
  lane count p*C fills the 128-wide MXU/VPU (p=8 for C=16 at 128², p=4 for
  C=32, p=2 for C=64). NHWC <-> row form is a *pure reshape* (row-major
  (i, g) rows, (px, c) lanes), so the inter-level XLA glue (2x2 avg pools,
  bilinear x2 upsamples, requants) runs on NHWC views for free;
- a 3x3 conv is 2 int8 matmuls: the 3 vertical taps of the row value are
  lane-concatenated (R, 3pC) against banded weights WM (in-row horizontal
  taps), and a compact 2C-lane neighbour composite [left px | right px]
  against WC (cross-group taps). MAC inflation over the dense fine conv is
  (p+2)/3 — the price of full-lane MXU occupancy at small channel counts;
- replicate borders are fixed in-register with `where` masks on image-local
  row/group indices — kernels are exact everywhere, including corners, and
  remain exact when several images share one grid step (`ib`, sized to
  VMEM): rolls that wrap across image boundaries are always overwritten by
  a border fix;
- one kernel = one conv (+ fused dequant/ReLU/requant epilogue, optional
  residual add, optional dual input for the decoder's skip concats, and an
  optional split epilogue emitting two half-row planes when p*C_out > 128).
  Consecutive layers exchange int8 rows-form tensors pallas-to-pallas,
  which is copy-free (all custom calls pin the default layout).

Reference anchors: conv semantics are the BN-folded ModelB_2 mid blocks
(reference model.py:85-159, 458-531, 608-645); exactness vs an int32-exact
XLA reference is asserted in tests/test_conv_px_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-output-channel symmetric int8 quantization — the ONE rule shared by
# every int8 serving path (models/quantized.py computes q with the f64
# scale before narrowing the returned scale to f32, so the int8 kernels
# here are bit-identical to the XLA int8 path's)
from sifsr_tpu.models.quantized import _quantize_kernel as _quant_w

__all__ = [
    "pack_prow_weights",
    "prow_leaf",
    "conv_prow",
    "conv_prow_dual",
    "conv_prow_dual_planes",
    "conv_prow_split_pool",
    "conv_prow_up2",
    "conv_prow_up2_pack",
    "up2_coeffs",
    "up2_coeffs_mxu",
    "up2_mxu_reference",
    "up2_perm",
    "nhwc_to_rows",
    "rows_to_nhwc",
    "planes_to_nhwc",
]


# ---------------------------------------------------------- form conversions


def nhwc_to_rows(x, p: int):
    """(N, H, W, C) -> (N, H*W/p, p*C): free reshape (no relayout)."""
    n, h, w, c = x.shape
    return x.reshape(n, h * (w // p), p * c)


def rows_to_nhwc(x, h: int, w: int, c: int):
    n = x.shape[0]
    return x.reshape(n, h, w, c)


def planes_to_nhwc(lo, hi, h: int, w: int, p: int, c: int):
    """Interleave split-epilogue half-row planes back to NHWC: lo carries
    pixels 0..p/2-1 of each p-group, hi pixels p/2..p-1."""
    n = lo.shape[0]
    g = w // p
    lo = lo.reshape(n, h, g, 1, p // 2, c)
    hi = hi.reshape(n, h, g, 1, p // 2, c)
    return jnp.concatenate([lo, hi], axis=3).reshape(n, h, w, c)


# ------------------------------------------------------------ weight packing


def up2_perm(p: int) -> tuple[int, ...]:
    """Lane-slot -> spatial-pixel map of conv_prow_up2's output rows: the
    fused x2 upsample emits each p-group e-major ([even out px | odd out
    px]); slot s < p/2 holds px 2s, slot s >= p/2 holds px 2(s-p/2)+1.
    Identity for p=2; (0, 2, 1, 3) for p=4. Consumers absorb it via
    pack_prow_weights(in_perm=...) — slot 0 is always px 0 and slot p-1
    always px p-1, so the kernels' composite/border lane slices are
    unchanged."""
    half = p // 2
    return tuple(2 * s if s < half else 2 * (s - half) + 1 for s in range(p))


def pack_prow_weights(k: np.ndarray, p: int,
                      in_perm=None) -> tuple[np.ndarray, np.ndarray]:
    """3x3 conv kernel (3, 3, Cin, Cout) -> (WM, WC) for p-pixel rows.

    WM (3*p*Cin, p*Cout): WM[tap*p*Cin + pin*Cin + ci, pout*Cout + co] =
    k[tap, pin-pout+1, ci, co] for |pin-pout| <= 1 (banded in-row taps).
    WC (6*Cin, p*Cout): the left composite pixel (group g-1's last px)
    feeds pout=0 with dw=-1, the right one (group g+1's first px) feeds
    pout=p-1 with dw=+1; `tap` is the vertical (dh+1) index.

    in_perm (len p) maps input LANE SLOT s -> spatial pixel in_perm[s]
    (e.g. up2_perm(p) for conv_prow_up2 producers); the banding is computed
    in spatial pixels, so the permutation is absorbed here for free. It must
    keep slot 0 = px 0 and slot p-1 = px p-1 (the composite slices assume
    that).
    """
    k = np.asarray(k)
    assert k.ndim == 4 and k.shape[0] == 3 and k.shape[1] == 3, k.shape
    if in_perm is None:
        in_perm = tuple(range(p))
    assert in_perm[0] == 0 and in_perm[p - 1] == p - 1, in_perm
    cin, cout = k.shape[2], k.shape[3]
    wm = np.zeros((3 * p * cin, p * cout), k.dtype)
    wc = np.zeros((6 * cin, p * cout), k.dtype)
    for tap in range(3):
        for slot in range(p):
            pin = in_perm[slot]
            for pout in range(p):
                if abs(pin - pout) > 1:
                    continue
                wm[tap * p * cin + slot * cin : tap * p * cin + (slot + 1) * cin,
                   pout * cout : (pout + 1) * cout] = k[tap, pin - pout + 1]
        wc[tap * 2 * cin : tap * 2 * cin + cin, 0:cout] = k[tap, 0]
        wc[tap * 2 * cin + cin : (tap + 1) * 2 * cin,
           (p - 1) * cout : p * cout] = k[tap, 2]
    return wm, wc


def prow_leaf(kernel, bias, p: int, s_in, s_out=None,
              post_scale=1.0, in_perm=None) -> dict:
    """One conv layer -> packed int8 weights + folded scale/bias tiled
    across the p output-pixel slots. The epilogue computes
    post(relu(y*scale + bias)): scale = s_in*sw[/s_out]*post_scale,
    bias = b[/s_out]*post_scale. in_perm: input lane-slot permutation
    (see pack_prow_weights)."""
    q, sw = _quant_w(kernel)
    wm, wc = pack_prow_weights(q, p, in_perm=in_perm)
    comb = float(s_in) * sw * float(post_scale)
    b = np.asarray(bias, np.float64) * float(post_scale)
    if s_out is not None:
        comb, b = comb / float(s_out), b / float(s_out)
    return {
        "wm": jnp.asarray(wm),
        "wc": jnp.asarray(wc),
        "scale": jnp.asarray(np.tile(comb, p).astype(np.float32)),
        "bias": jnp.asarray(np.tile(b, p).astype(np.float32)),
    }


# ----------------------------------------------------------- in-kernel conv


def _shift_rows(v, by: int):
    """t[r] = v[r + by] (wrapping) for int8 (R, L). Multiples of 4 are an
    int32-packed roll (4 rows per 32-bit word, row 4s+k in byte k); +-1 is
    the byte shift with word carry (same trick as conv_i8._row_shift_*)."""
    if by == 0:
        return v
    if by % 4 == 0:
        v32 = pltpu.bitcast(v, jnp.uint32)
        return pltpu.bitcast(
            pltpu.roll(v32, (-by // 4) % v32.shape[0], axis=0), jnp.int8)
    if by == 1:
        v32 = pltpu.bitcast(v, jnp.uint32)
        carry = pltpu.roll(v32, v32.shape[0] - 1, axis=0) << 24
        return pltpu.bitcast((v32 >> 8) | carry, jnp.int8)
    if by == -1:
        v32 = pltpu.bitcast(v, jnp.uint32)
        carry = pltpu.roll(v32, 1, axis=0) >> 24
        return pltpu.bitcast((v32 << 8) | carry, jnp.int8)
    # general case: floor-multiple-of-4 word roll + 1..3 byte shifts
    base = (by // 4) * 4
    out = _shift_rows(v, base) if base else v
    for _ in range(by - base):
        out = _shift_rows(out, 1)
    return out


def _geometry(rows: int, r_img: int, gpi: int):
    rr = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % r_img
    return rr % gpi, rr // gpi


def _conv_once(v, c_in: int, wm_ref, wc_ref, r_img: int, gpi: int, hh: int):
    """Exact 3x3 replicate-pad conv on p-rows: int32 accumulator."""
    rows, lanes = v.shape
    gidx, iidx = _geometry(rows, r_img, gpi)

    prev = _shift_rows(v, -1)
    nxt = _shift_rows(v, 1)
    left = jnp.where(gidx == 0, v[:, 0:c_in], prev[:, lanes - c_in : lanes])
    right = jnp.where(gidx == gpi - 1, v[:, lanes - c_in : lanes],
                      nxt[:, 0:c_in])
    comp = jnp.concatenate([left, right], axis=1)

    def vtaps(x):
        up = _shift_rows(x, -gpi)
        dn = _shift_rows(x, gpi)
        top = jnp.where(iidx == 0, x, up)
        bot = jnp.where(iidx == hh - 1, x, dn)
        return jnp.concatenate([top, x, bot], axis=1)

    v3, c3 = vtaps(v), vtaps(comp)
    ya = jax.lax.dot_general(v3, wm_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    yb = jax.lax.dot_general(c3, wc_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    return ya + yb


def _requant(yf, out_dtype):
    if out_dtype == jnp.int8:
        return jnp.clip(jnp.round(yf), -127, 127).astype(jnp.int8)
    return yf.astype(out_dtype)


# --------------------------------------------------------------- the kernels


def _epi(y, sc_ref, b_ref, relu: bool):
    yf = y.astype(jnp.float32) * sc_ref[0] + b_ref[0]
    return jnp.maximum(yf, 0.0) if relu else yf


def _conv_kernel(x_ref, wm, wc, sc, b, out_ref, *, c, p, r_img, gpi, hh, ib,
                 relu, out_dtype, fold=1):
    v = x_ref[...].reshape(ib * r_img // fold, p * c)
    y = _conv_once(v, c, wm, wc, r_img // fold, gpi, hh)
    out_ref[...] = _requant(_epi(y, sc, b, relu), out_dtype).reshape(
        out_ref.shape)


def _conv_res_kernel(x_ref, v0_ref, wm, wc, sc, b, res_sc, out_ref, *, c, p,
                     r_img, gpi, hh, ib, relu, out_dtype):
    """out = requant(v0 * res_sc + relu(y*sc + b)) — the residual add of
    DownBlock_pool's ResidualConnection fused into conv2's epilogue (the
    1/s_next requant fold is prescaled into sc/b/res_sc)."""
    v = x_ref[...].reshape(ib * r_img, p * c)
    y = _conv_once(v, c, wm, wc, r_img, gpi, hh)
    yf = _epi(y, sc, b, relu)
    v0 = v0_ref[...].reshape(yf.shape[0], -1)
    out_ref[...] = _requant(v0.astype(jnp.float32) * res_sc[0] + yf,
                            out_dtype).reshape(out_ref.shape)


def _conv_split_kernel(x_ref, wm, wc, sc, b, lo_ref, hi_ref, *, c, p, r_img,
                       gpi, hh, ib, relu, out_dtype):
    v = x_ref[...].reshape(ib * r_img, p * c)
    y = _conv_once(v, c, wm, wc, r_img, gpi, hh)
    yf = _epi(y, sc, b, relu)
    half = yf.shape[1] // 2
    lo_ref[...] = _requant(yf[:, :half], out_dtype).reshape(lo_ref.shape)
    hi_ref[...] = _requant(yf[:, half:], out_dtype).reshape(hi_ref.shape)


def _conv_dual_kernel(x_ref, z_ref, wmx, wcx, wmz, wcz, scx, scz, b,
                      out_ref, *, c, p, r_img, gpi, hh, ib, relu, out_dtype):
    """conv(concat(x, z)) = conv_x(x) + conv_z(z): the decoder skip concat
    never materialises (same trick as conv_i8_exact_dual)."""
    vx = x_ref[...].reshape(ib * r_img, p * c)
    vz = z_ref[...].reshape(ib * r_img, p * c)
    yx = _conv_once(vx, c, wmx, wcx, r_img, gpi, hh)
    yz = _conv_once(vz, c, wmz, wcz, r_img, gpi, hh)
    yf = (yx.astype(jnp.float32) * scx[0]
          + yz.astype(jnp.float32) * scz[0] + b[0])
    if relu:
        yf = jnp.maximum(yf, 0.0)
    out_ref[...] = _requant(yf, out_dtype).reshape(out_ref.shape)


# ------------------------------------------------------------ public entries


def _wspec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _img_block(ib, r_img, lanes):
    return pl.BlockSpec((ib, r_img, lanes), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


IB_BUDGET = 12 * 2**20   # scoped-VMEM fill target for per-image blocking
                         # (measured faster than 8 MiB on the 128²-level
                         # kernels; 16 MiB is the hard Mosaic limit)


def _clamp_ib(n: int, per_img: int, budget: int = IB_BUDGET) -> int:
    """Images per grid step for an estimated per-image VMEM footprint:
    fill ~budget, cap 8, and divide the batch evenly."""
    ib = max(1, min(8, budget // max(per_img, 1)))
    while n % ib:
        ib -= 1
    return ib


def _pick_ib(n: int, r_img: int, lanes: int, lanes_out: int) -> int:
    """The footprint is dominated by the int32 accumulator + the f32
    epilogue value (8 bytes/lane_out) plus the int8 operands (~9 bytes/lane
    with the tap concats)."""
    return _clamp_ib(n, r_img * (9 * lanes + 12 * lanes_out))


def _vec(a):
    return a.reshape(1, -1)


@functools.partial(jax.jit, static_argnames=(
    "p", "c", "c_out", "h", "w", "relu", "split", "out_dtype", "fold",
    "interpret"))
def conv_prow(x_rows, leaf: dict, p: int, c: int, c_out: int, h: int, w: int,
              relu: bool = True, residual=None, split: bool = False,
              out_dtype=jnp.int8, fold: int = 1, interpret: bool = False):
    """Exact p-row 3x3 conv, one custom call.

    x_rows (N, H*W/p, p*c) int8 -> (N, R, p*c_out) (or two half-row planes
    when split=True, for p*c_out > 128). leaf from prow_leaf; when
    `residual` is given, leaf must also hold 'res_sc' (1-vector f32) and the
    epilogue adds residual*res_sc before requantization.

    fold=k folds k consecutive input rows into lanes in the prologue
    (x_rows lanes * k == p * c, p/c/leaf in FOLDED geometry): runs a conv
    whose natural p*c_out would fall below 128 lanes at doubled p instead
    (Mosaic rejects reshapes through sub-128-lane vectors, so narrow rows
    never exist). Plain path only (no residual/split)."""
    n, r_img, lanes = x_rows.shape
    assert lanes * fold == p * c, (lanes, fold, p, c)
    assert fold == 1 or (residual is None and not split), "fold: plain only"
    gpi = w // p
    lanes_out = p * c_out
    ib = _pick_ib(n, r_img, lanes, lanes_out)
    common = dict(c=c, p=p, r_img=r_img, gpi=gpi, hh=h, ib=ib, relu=relu,
                  out_dtype=out_dtype)
    w_specs = [_wspec(leaf["wm"].shape), _wspec(leaf["wc"].shape),
               _wspec((1, lanes_out)), _wspec((1, lanes_out))]
    w_args = [leaf["wm"], leaf["wc"], _vec(leaf["scale"]), _vec(leaf["bias"])]
    if split:
        half = lanes_out // 2
        return pl.pallas_call(
            functools.partial(_conv_split_kernel, **common),
            grid=(n // ib,),
            in_specs=[_img_block(ib, r_img, lanes)] + w_specs,
            out_specs=(_img_block(ib, r_img, half),
                       _img_block(ib, r_img, half)),
            out_shape=(jax.ShapeDtypeStruct((n, r_img, half), out_dtype),
                       jax.ShapeDtypeStruct((n, r_img, half), out_dtype)),
            interpret=interpret,
        )(x_rows, *w_args)
    assert lanes_out <= 128, lanes_out
    if residual is not None:
        return pl.pallas_call(
            functools.partial(_conv_res_kernel, **common),
            grid=(n // ib,),
            in_specs=[_img_block(ib, r_img, lanes),
                      _img_block(ib, r_img, residual.shape[2])]
            + w_specs + [_wspec((1, lanes_out))],
            out_specs=_img_block(ib, r_img, lanes_out),
            out_shape=jax.ShapeDtypeStruct((n, r_img, lanes_out), out_dtype),
            interpret=interpret,
        )(x_rows, residual, *w_args, _vec(leaf["res_sc"]))
    return pl.pallas_call(
        functools.partial(_conv_kernel, fold=fold, **common),
        grid=(n // ib,),
        in_specs=[_img_block(ib, r_img, lanes)] + w_specs,
        out_specs=_img_block(ib, r_img // fold, lanes_out),
        out_shape=jax.ShapeDtypeStruct((n, r_img // fold, lanes_out),
                                       out_dtype),
        interpret=interpret,
    )(x_rows, *w_args)


@functools.partial(jax.jit, static_argnames=(
    "p", "c", "c_out", "h", "w", "relu", "out_dtype", "interpret"))
def conv_prow_dual(x_rows, z_rows, leafx: dict, leafz: dict, p: int, c: int,
                   c_out: int, h: int, w: int, relu: bool = True,
                   out_dtype=jnp.int8, interpret: bool = False):
    """Skip-concat conv: conv(concat(x, z)), both (N, H*W/p, p*c) int8;
    leafx carries the shared bias."""
    n, r_img, lanes = x_rows.shape
    assert lanes == p * c and z_rows.shape == x_rows.shape
    gpi = w // p
    lanes_out = p * c_out
    assert lanes_out <= 128, lanes_out
    ib = _pick_ib(n, r_img, 2 * lanes, lanes_out)
    return pl.pallas_call(
        functools.partial(_conv_dual_kernel, c=c, p=p, r_img=r_img, gpi=gpi,
                          hh=h, ib=ib, relu=relu, out_dtype=out_dtype),
        grid=(n // ib,),
        in_specs=[_img_block(ib, r_img, lanes), _img_block(ib, r_img, lanes),
                  _wspec(leafx["wm"].shape), _wspec(leafx["wc"].shape),
                  _wspec(leafz["wm"].shape), _wspec(leafz["wc"].shape),
                  _wspec((1, lanes_out)), _wspec((1, lanes_out)),
                  _wspec((1, lanes_out))],
        out_specs=_img_block(ib, r_img, lanes_out),
        out_shape=jax.ShapeDtypeStruct((n, r_img, lanes_out), out_dtype),
        interpret=interpret,
    )(x_rows, z_rows, leafx["wm"], leafx["wc"], leafz["wm"], leafz["wc"],
      _vec(leafx["scale"]), _vec(leafz["scale"]), _vec(leafx["bias"]))


# ------------------------- fused inter-level glue (pool / up2 / interleave)
#
# Round-3 profiling: with per-layer prow kernels the mid chain's remaining
# cost was ~9 ms/iter of XLA relayout copies at every rows<->NHWC boundary
# (pallas custom calls pin the default layout; a (R, 128) <-> (R*4, 32)
# "free" reshape still changes the tile layout, so XLA materialises it).
# The fix: inter-level glue runs INSIDE the kernels —
# - 2x2 avg pool: an int8 lane matmul (pixel-pair sums per split half) +
#   (R, L) <-> (R/k, k*L) row reshapes for the vertical pair sum (in-kernel
#   reshapes on the row dim are register moves, verified on v5e);
# - decoder skip concat: z arrives as the producer's two split half-planes
#   and is interleaved in the prologue by one lane-concat + row reshape;
# - align-corners bilinear x2: per-phase roll/fma passes (the same stencil
#   decomposition as pallas/resize_phases, exact vs resize_matrix) fused
#   into the producing conv's epilogue, emitting the consumer's rows form
#   directly (e-major p-groups — see up2_perm).


def _hpool_matrix(p: int, c: int) -> np.ndarray:
    """(p/2*c, p/4*c) int8 summing matrix: adds horizontal pixel pairs of a
    split half-plane, per channel."""
    half = p // 2
    m = np.zeros((half * c, (half // 2) * c), np.int8)
    for s in range(half):
        for ch in range(c):
            m[s * c + ch, (s // 2) * c + ch] = 1
    return m


def _conv_split_pool_kernel(x_ref, wm, wc, sc, b, phm, psc, lo_ref, hi_ref,
                            pool_ref, *, c, p, r_img, gpi, hh, ib, relu,
                            out_dtype):
    """Split conv + fused 2x2 avg pool: the two half-planes feed the decoder
    skip; the pooled output (rows form of the next level, p/2 px of 2c ch at
    half resolution) feeds the next DownBlock with zero XLA glue. The pool
    matches models/pallas_serving._pool_quant_i8 exactly (int32 4-px sum of
    the REQUANTIZED int8, one folded f32 rescale)."""
    v = x_ref[...].reshape(ib * r_img, p * c)
    y = _conv_once(v, c, wm, wc, r_img, gpi, hh)
    yf = _epi(y, sc, b, relu)
    half = yf.shape[1] // 2
    qlo = _requant(yf[:, :half], out_dtype)
    qhi = _requant(yf[:, half:], out_dtype)
    lo_ref[...] = qlo.reshape(lo_ref.shape)
    hi_ref[...] = qhi.reshape(hi_ref.shape)

    dn = (((1,), (0,)), ((), ()))
    hl = jax.lax.dot_general(qlo, phm[...], dn,
                             preferred_element_type=jnp.int32)
    hr = jax.lax.dot_general(qhi, phm[...], dn,
                             preferred_element_type=jnp.int32)
    acc = jnp.concatenate([hl, hr], axis=1)          # (R, 128): (out px, 2c)
    rows = acc.shape[0]
    acc = acc.reshape(rows // gpi, gpi * 128)        # whole image rows
    acc = acc.reshape(rows // (2 * gpi), 2 * gpi * 128)
    acc = acc[:, : gpi * 128] + acc[:, gpi * 128 :]  # vertical pair sum
    acc = acc.reshape(rows // 2, 128)
    pool_ref[...] = _requant(acc.astype(jnp.float32) * psc[0],
                             jnp.int8).reshape(pool_ref.shape)


@functools.partial(jax.jit, static_argnames=(
    "p", "c", "c_out", "h", "w", "relu", "out_dtype", "interpret"))
def conv_prow_split_pool(x_rows, leaf: dict, p: int, c: int, c_out: int,
                         h: int, w: int, relu: bool = True,
                         out_dtype=jnp.int8, interpret: bool = False):
    """conv_prow(split=True) + fused 2x2 avg pool -> (lo, hi, pooled).

    lo/hi: the split half-planes (N, H*W/p, p*c_out/2) at full resolution
    (decoder skip inputs, consumed by conv_prow_dual's z_planes). pooled:
    (N, H*W/(2p), p*c_out/2) int8 — the NEXT level's rows form (p/2 pixels
    of c_out channels at H/2 x W/2). leaf needs 'pool_sc' (128-vec f32,
    s_mid / (4 * s_next))."""
    n, r_img, lanes = x_rows.shape
    assert lanes == p * c, (lanes, p, c)
    gpi = w // p
    lanes_out = p * c_out
    assert lanes_out == 256, lanes_out
    ib = _pick_ib(n, r_img, lanes, lanes_out)
    phm = jnp.asarray(_hpool_matrix(p, c_out))
    return pl.pallas_call(
        functools.partial(_conv_split_pool_kernel, c=c, p=p, r_img=r_img,
                          gpi=gpi, hh=h, ib=ib, relu=relu,
                          out_dtype=out_dtype),
        grid=(n // ib,),
        in_specs=[_img_block(ib, r_img, lanes),
                  _wspec(leaf["wm"].shape), _wspec(leaf["wc"].shape),
                  _wspec((1, lanes_out)), _wspec((1, lanes_out)),
                  _wspec(phm.shape), _wspec((1, 128))],
        out_specs=(_img_block(ib, r_img, 128),
                   _img_block(ib, r_img, 128),
                   _img_block(ib, r_img // 2, 128)),
        out_shape=(jax.ShapeDtypeStruct((n, r_img, 128), out_dtype),
                   jax.ShapeDtypeStruct((n, r_img, 128), out_dtype),
                   jax.ShapeDtypeStruct((n, r_img // 2, 128), jnp.int8)),
        interpret=interpret,
    )(x_rows, leaf["wm"], leaf["wc"], _vec(leaf["scale"]), _vec(leaf["bias"]),
      phm, _vec(leaf["pool_sc"]))


def _interleave_planes(lo, hi):
    """Two (R, L) half-plane values -> (2R, L) rows alternating lo/hi (the
    split-epilogue inverse): one lane concat + a row reshape."""
    r, l = lo.shape
    return jnp.concatenate([lo, hi], axis=1).reshape(2 * r, l)


def _conv_dual_planes_kernel(x_ref, zlo_ref, zhi_ref, wmx, wcx, wmz, wcz,
                             scx, scz, b, out_ref, *, c, p, r_img, gpi, hh,
                             ib, relu, out_dtype):
    vx = x_ref[...].reshape(ib * r_img, p * c)
    zl = zlo_ref[...].reshape(ib * r_img // 2, p * c)
    vz = _interleave_planes(zl, zhi_ref[...].reshape(zl.shape))
    yx = _conv_once(vx, c, wmx, wcx, r_img, gpi, hh)
    yz = _conv_once(vz, c, wmz, wcz, r_img, gpi, hh)
    yf = (yx.astype(jnp.float32) * scx[0]
          + yz.astype(jnp.float32) * scz[0] + b[0])
    if relu:
        yf = jnp.maximum(yf, 0.0)
    out_ref[...] = _requant(yf, out_dtype).reshape(out_ref.shape)


@functools.partial(jax.jit, static_argnames=(
    "p", "c", "c_out", "h", "w", "relu", "out_dtype", "interpret"))
def conv_prow_dual_planes(x_rows, z_lo, z_hi, leafx: dict, leafz: dict,
                          p: int, c: int, c_out: int, h: int, w: int,
                          relu: bool = True, out_dtype=jnp.int8,
                          interpret: bool = False):
    """conv_prow_dual with the skip input as the producer's split
    half-planes (conv_prow_split_pool's lo/hi), interleaved in the
    prologue — the decoder consumes the encoder skips with no XLA hop."""
    n, r_img, lanes = x_rows.shape
    assert lanes == p * c, (lanes, p, c)
    assert z_lo.shape == z_hi.shape == (n, r_img // 2, lanes)
    gpi = w // p
    lanes_out = p * c_out
    assert lanes_out <= 128, lanes_out
    ib = _pick_ib(n, r_img, 2 * lanes, lanes_out)
    return pl.pallas_call(
        functools.partial(_conv_dual_planes_kernel, c=c, p=p, r_img=r_img,
                          gpi=gpi, hh=h, ib=ib, relu=relu,
                          out_dtype=out_dtype),
        grid=(n // ib,),
        in_specs=[_img_block(ib, r_img, lanes),
                  _img_block(ib, r_img // 2, lanes),
                  _img_block(ib, r_img // 2, lanes),
                  _wspec(leafx["wm"].shape), _wspec(leafx["wc"].shape),
                  _wspec(leafz["wm"].shape), _wspec(leafz["wc"].shape),
                  _wspec((1, lanes_out)), _wspec((1, lanes_out)),
                  _wspec((1, lanes_out))],
        out_specs=_img_block(ib, r_img, lanes_out),
        out_shape=jax.ShapeDtypeStruct((n, r_img, lanes_out), out_dtype),
        interpret=interpret,
    )(x_rows, z_lo, z_hi, leafx["wm"], leafx["wc"], leafz["wm"], leafz["wc"],
      _vec(leafx["scale"]), _vec(leafz["scale"]), _vec(leafx["bias"]))


def _conv_up2_kernel(x_ref, wm, wc, sc, b, rc_ref, cc_ref, inv_ref, out_ref,
                     *, c, p, r_img, gpi, hh, ib, relu, deltas, c_out, p_out,
                     fold):
    """Conv + requant + fused align-corners bilinear x2, emitting the
    consumer's rows form (p_out px at 2H x 2W, e-major groups: up2_perm).
    Every intermediate keeps >= 128 lanes (Mosaic rejects reshapes through
    narrower vectors), hence the fold prologue and the 64-lane-slice
    group assembly."""
    v = x_ref[...].reshape(ib * r_img // fold, p * c)
    y = _conv_once(v, c, wm, wc, r_img // fold, gpi, hh)
    q = _requant(_epi(y, sc, b, relu), jnp.int8)      # (R, p*c_out) >= 128
    w_img = gpi * p
    wcl = w_img * c_out
    vv = q.reshape(ib * hh, wcl).astype(jnp.float32)

    # the rolled copies are the kernel's bandwidth cost — compute each
    # distinct shift ONCE and reuse across the d/e phase loops (the same
    # roll was previously re-materialised per phase)
    row_shift = {dd: (pltpu.roll(vv, (-dd) % vv.shape[0], axis=0) if dd else vv)
                 for dd in deltas}
    planes = []                                        # d-major, then e
    for d in range(2):
        r = None
        for j, dd in enumerate(deltas):
            coef = rc_ref[d, j]                        # (ib*hh, 1)
            term = coef * row_shift[dd]
            r = term if r is None else r + term
        col_shift = {dd: (pltpu.roll(r, (-dd * c_out) % wcl, axis=1)
                          if dd else r) for dd in deltas}
        for e in range(2):
            yde = None
            for j, dd in enumerate(deltas):
                coef = cc_ref[e, j].reshape(1, wcl)
                term = coef * col_shift[dd]
                yde = term if yde is None else yde + term
            planes.append(_requant(yde * inv_ref[0], jnp.int8))

    def d_plane(q0, q1):
        # rows (i, a): 128 lanes = TWO consecutive out-groups' e-parts
        a0 = q0.reshape(ib * hh * wcl // 128, 128)
        a1 = q1.reshape(a0.shape)
        cat = jnp.concatenate(
            [a0[:, :64], a1[:, :64], a0[:, 64:], a1[:, 64:]], axis=1)
        return cat.reshape(2 * a0.shape[0], 128)       # rows (i, g_out)

    c0, c1 = d_plane(planes[0], planes[1]), d_plane(planes[2], planes[3])
    b0 = c0.reshape(ib * hh, 2 * wcl)
    b1 = c1.reshape(ib * hh, 2 * wcl)
    out = jnp.concatenate([b0, b1], axis=1).reshape(2 * ib * hh, 2 * wcl)
    out_ref[...] = out.reshape(out_ref.shape)


def _mxu_phase_planes(q, rm_ref, cc_ref, inv_ref, *, ib, hh, wcl, cdeltas,
                      c_out):
    """The 4 requantized int8 x2 phase planes ((d, e) order, each reshaped
    to (ib*hh*wcl/128, 128)) via the integer-exact MXU row mix: one bf16
    matmul per image replaces the VPU row pass (see up2_coeffs_mxu)."""
    qb = q.reshape(ib * hh, wcl).astype(jnp.bfloat16)
    rm = rm_ref[...]                                   # (2*hh, hh) bf16
    rs = [jax.lax.dot_general(rm, qb[i * hh : (i + 1) * hh],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
          for i in range(ib)]
    planes = []
    for d in range(2):
        if ib > 1:
            r = jnp.concatenate([ri[d * hh : (d + 1) * hh] for ri in rs],
                                axis=0)
        else:
            r = rs[0][d * hh : (d + 1) * hh]
        col_shift = {dd: (pltpu.roll(r, (-dd * c_out) % wcl, axis=1)
                          if dd else r) for dd in cdeltas}
        for e in range(2):
            yde = None
            for j, dd in enumerate(cdeltas):
                coef = cc_ref[e, j].reshape(1, wcl)
                term = coef * col_shift[dd]
                yde = term if yde is None else yde + term
            planes.append(_requant(yde * inv_ref[0], jnp.int8)
                          .reshape(ib * hh * wcl // 128, 128))
    return planes


def _conv_up2_mxu_kernel(x_ref, wm, wc, sc, b, rm_ref, cc_ref, inv_ref,
                         out_ref, *, c, p, r_img, gpi, hh, ib, relu, cdeltas,
                         c_out, p_out, fold):
    """_conv_up2_kernel with the integer-exact MXU row mix (up2_impl='mxu');
    the e-major group assembly is identical."""
    v = x_ref[...].reshape(ib * r_img // fold, p * c)
    y = _conv_once(v, c, wm, wc, r_img // fold, gpi, hh)
    q = _requant(_epi(y, sc, b, relu), jnp.int8)
    w_img = gpi * p
    wcl = w_img * c_out
    planes = _mxu_phase_planes(q, rm_ref, cc_ref, inv_ref, ib=ib, hh=hh,
                               wcl=wcl, cdeltas=cdeltas, c_out=c_out)

    def d_plane(q0, q1):
        a0 = q0
        a1 = q1
        cat = jnp.concatenate(
            [a0[:, :64], a1[:, :64], a0[:, 64:], a1[:, 64:]], axis=1)
        return cat.reshape(2 * a0.shape[0], 128)

    c0, c1 = d_plane(planes[0], planes[1]), d_plane(planes[2], planes[3])
    b0 = c0.reshape(ib * hh, 2 * wcl)
    b1 = c1.reshape(ib * hh, 2 * wcl)
    out = jnp.concatenate([b0, b1], axis=1).reshape(2 * ib * hh, 2 * wcl)
    out_ref[...] = out.reshape(out_ref.shape)


def _conv_up2_pack_mxu_kernel(x_ref, wm, wc, sc, b, rm_ref, cc_ref, inv_ref,
                              pk_ref, out_ref, *, c, p, r_img, gpi, hh, ib,
                              relu, cdeltas, c_out, fold):
    """_conv_up2_pack_kernel with the integer-exact MXU row mix."""
    v = x_ref[...].reshape(ib * r_img // fold, p * c)
    y = _conv_once(v, c, wm, wc, r_img // fold, gpi, hh)
    q = _requant(_epi(y, sc, b, relu), jnp.int8)
    w_img = gpi * p
    wcl = w_img * c_out
    planes = _mxu_phase_planes(q, rm_ref, cc_ref, inv_ref, ib=ib, hh=hh,
                               wcl=wcl, cdeltas=cdeltas, c_out=c_out)
    cat = jnp.concatenate(planes, axis=1)              # (R2, 512)
    pp = jax.lax.dot_general(cat, pk_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32).astype(jnp.int8)
    out_ref[...] = pp.reshape(4 * pp.shape[0], 128).reshape(out_ref.shape)


@functools.lru_cache(maxsize=None)
def _up2_cdeltas(w: int) -> tuple[int, ...]:
    """Static column-pass tap offsets for the MXU row-mix kernels."""
    from sifsr_tpu.pallas.resize_phases import _coeff_arrays

    cdeltas, _ = _coeff_arrays(w, 2, "linear_ac", 1, False)
    return tuple(cdeltas)


@functools.lru_cache(maxsize=None)
def _up2_deltas(h: int, w: int) -> tuple[int, ...]:
    """Static tap-offset set of the x2 linear_ac stencil (deltas must be
    compile-time constants; the traced leaf dict cannot carry them)."""
    from sifsr_tpu.pallas.resize_phases import _coeff_arrays

    rdeltas, _ = _coeff_arrays(h, 2, "linear_ac", 1, False)
    cdeltas, _ = _coeff_arrays(w, 2, "linear_ac", 1, False)
    return tuple(sorted(set(rdeltas) | set(cdeltas)))


def up2_coeffs(h: int, w: int, c_out: int, s_mid: float, s_up: float):
    """(deltas, rc (2, nd, h, 1), cc (2, nd, wc), inv) for the fused x2:
    the resize_phases stencil decomposition with the int8 dequant (s_mid)
    folded into the row pass; inv = 1/s_up is applied AFTER the column-pass
    summation (matching upsample_phases' epilogue order bit-for-bit)."""
    from sifsr_tpu.pallas.resize_phases import _coeff_arrays

    rdeltas, rcoef = _coeff_arrays(h, 2, "linear_ac", c_out, False)
    cdeltas, ccoef = _coeff_arrays(w, 2, "linear_ac", c_out, True)
    deltas = _up2_deltas(h, w)

    def expand(coeff, have, size):
        full = np.zeros((2, len(deltas), size), np.float32)
        for j, d in enumerate(have):
            full[:, deltas.index(d)] = coeff[:, j]
        return full

    rc = expand(rcoef, rdeltas, h)[..., None] * float(s_mid)
    cc = expand(ccoef, cdeltas, w * c_out)
    inv = np.float32(1.0 / float(s_up))
    return deltas, rc.astype(np.float32), cc.astype(np.float32), inv


# ------------------------ integer-exact MXU row-mix variant (up2_impl='mxu')
#
# The align-corners x2 coefficients are the rationals m/D with D = 2*size-1
# and integer numerators m in [0, D] (src = i_out*(size-1)/D). That admits an
# integer-exact refactoring that moves the whole ROW pass from the VPU onto
# the (otherwise idle) MXU:
#   - row pass: r = RM @ q as ONE bf16 matmul per image, where RM holds the
#     integer numerators (<= 255 <= 2^8, exact in bf16) and q is the int8
#     conv output (|q| <= 127, exact in bf16). The MXU accumulates in f32;
#     every product (<= 255*127) and every 2-term row sum (<= D*127 =
#     32 385 < 2^24) is exactly representable, so r is INTEGER-exact;
#   - column pass: the usual per-lane roll/fma VPU pass, but with integer
#     numerator coefficients — products (<= 255 * 32 385 = 8.26e6 < 2^24)
#     and the 2-term sums (<= D_c * max|r| < 2^24, since the pair of
#     numerators sums to exactly D_c) stay integer-exact in f32;
#   - ONE rounding total: y * inv with inv = s_mid / (D_r * D_c * s_up),
#     then the round/clip requant. (The VPU path rounds each coefficient to
#     f32 and each product; this form is strictly closer to the true rational
#     interpolation. Outputs can differ from the VPU path by 1 int8 quantum
#     on round-boundary values — quality is gated end-to-end by the 80-pair
#     harness, tests/test_conv_px_pallas.py pins bit-exactness vs
#     up2_mxu_reference.)
# Measured motivation: the VPU row pass (cast + roll + 2x fma chain over the
# (ib*h, w*c_out) f32 plane) was ~40% of conv_prow_up2_pack's 5.6 ms/iter at
# batch 384; the bf16 matmul form does the same mix in ~0.3 ms of MXU time.


def _int_numerators(coef: np.ndarray, denom: int) -> np.ndarray:
    """Recover the exact integer numerators m from f32-rounded m/denom."""
    m = np.rint(coef.astype(np.float64) * denom)
    err = np.max(np.abs(m - coef.astype(np.float64) * denom))
    assert err < 0.01, (err, denom)
    return m


def up2_coeffs_mxu(h: int, w: int, c_out: int, s_mid: float, s_up: float):
    """(cdeltas, rm (2h, h) bf16, cc (2, ncd, w*c_out) f32, inv f32) for the
    MXU row-mix form of the fused x2 (see block comment above). rm rows are
    d-major: row d*h + k produces fine row 2k + d."""
    from sifsr_tpu.pallas.resize_phases import _coeff_arrays

    d_r, d_c = 2 * h - 1, 2 * w - 1
    rdeltas, rcoef = _coeff_arrays(h, 2, "linear_ac", 1, False)
    cdeltas, ccoef = _coeff_arrays(w, 2, "linear_ac", c_out, True)
    rint = _int_numerators(rcoef, d_r)                 # (2, nrd, h)
    cint = _int_numerators(ccoef, d_c)                 # (2, ncd, w*c_out)
    assert np.max(np.abs(rint)) <= d_r and np.max(np.abs(cint)) <= d_c

    rm = np.zeros((2 * h, h), np.float64)
    for d in range(2):
        for jd, delta in enumerate(rdeltas):
            for k in range(h):
                m = rint[d, jd, k]
                if m:
                    rm[d * h + k, k + delta] = m
    inv = np.float32(np.float64(s_mid) / (d_r * d_c * np.float64(s_up)))
    return tuple(cdeltas), rm.astype(np.float32), cint.astype(np.float32), inv


def up2_mxu_reference(mid_i8, h: int, w: int, c_out: int, s_mid, s_up):
    """Integer-exact numpy twin of the MXU up2 path: (n, h, w, c) int8 ->
    (n, 2h, 2w, c) int8 at the s_up scale (the fused kernels' epilogue
    applied to the exact rational interpolation). Used by the exactness
    tests; the single f32 rounding matches the kernels bit-for-bit."""
    from sifsr_tpu.pallas.resize_phases import _coeff_arrays

    mid = np.asarray(mid_i8).astype(np.float64)
    n, hh, ww, c = mid.shape
    assert (hh, ww, c) == (h, w, c_out)
    d_r, d_c = 2 * h - 1, 2 * w - 1
    rdeltas, rcoef = _coeff_arrays(h, 2, "linear_ac", 1, False)
    cdeltas, ccoef = _coeff_arrays(w, 2, "linear_ac", 1, False)
    rint = _int_numerators(rcoef, d_r)
    cint = _int_numerators(ccoef, d_c)

    def mix(size, deltas, coefs):
        m = np.zeros((2 * size, size), np.float64)
        for d in range(2):
            for jd, delta in enumerate(deltas):
                for k in range(size):
                    v = coefs[d, jd, k]
                    if v:
                        m[d * size + k, k + delta] = v
        # d-major -> fine-row order (2k + d)
        return m[[d * size + k for k in range(size) for d in range(2)]]

    rmat = mix(h, rdeltas, rint)                       # (2h, h) fine-row order
    cmat = mix(w, cdeltas, cint)                       # (2w, w)
    t = np.einsum("ok,nkwc->nowc", rmat, mid)          # integer-exact
    y = np.einsum("pl,nolc->nopc", cmat, t)
    inv = np.float32(np.float64(s_mid) / (d_r * d_c * np.float64(s_up)))
    yq = np.round(y.astype(np.float32) * inv)
    return np.clip(yq, -127, 127).astype(np.int8)


def _pack_pairrow_matrix() -> np.ndarray:
    """(512, 512) int8 permutation: 4 lane-concatenated x2-phase plane
    chunks [(q, r) plane: 8 px x 16 ch] -> 4 packed pair-rows' lanes
    (pair, px, q, r, ch) — the (R, 512) -> (4R, 128) reshape after this
    matmul yields conv_i8_exact's pair-row input form directly."""
    m = np.zeros((512, 512), np.int8)
    for q in range(2):
        for r in range(2):
            for px in range(8):
                for ch in range(16):
                    src = ((q * 2 + r) * 8 + px) * 16 + ch
                    dst = ((px // 2) * 128 + (px % 2) * 64
                           + q * 32 + r * 16 + ch)
                    m[src, dst] = 1
    return m


def _conv_up2_pack_kernel(x_ref, wm, wc, sc, b, rc_ref, cc_ref, inv_ref,
                          pk_ref, out_ref, *, c, p, r_img, gpi, hh, ib, relu,
                          deltas, c_out, fold):
    """ub2.conv2 + the FINAL x2 linear_ac upsample + space-to-depth packing
    to 256²-level pair rows (the serving tail): the four x2 phase planes
    (q, r) are the packed cell, so packing is a fixed lane permutation
    (one int8 matmul) + row reshapes — no XLA transpose."""
    v = x_ref[...].reshape(ib * r_img // fold, p * c)
    y = _conv_once(v, c, wm, wc, r_img // fold, gpi, hh)
    q = _requant(_epi(y, sc, b, relu), jnp.int8)
    w_img = gpi * p
    wcl = w_img * c_out
    vv = q.reshape(ib * hh, wcl).astype(jnp.float32)

    # hoist each distinct roll out of the phase loops (see _conv_up2_kernel)
    row_shift = {dd: (pltpu.roll(vv, (-dd) % vv.shape[0], axis=0) if dd else vv)
                 for dd in deltas}
    planes = []                                        # (q=d, r=e) order
    for d in range(2):
        r = None
        for j, dd in enumerate(deltas):
            coef = rc_ref[d, j]
            term = coef * row_shift[dd]
            r = term if r is None else r + term
        col_shift = {dd: (pltpu.roll(r, (-dd * c_out) % wcl, axis=1)
                          if dd else r) for dd in deltas}
        for e in range(2):
            yde = None
            for j, dd in enumerate(deltas):
                coef = cc_ref[e, j].reshape(1, wcl)
                term = coef * col_shift[dd]
                yde = term if yde is None else yde + term
            # (ib*hh, wcl) -> (ib*hh*wcl/128, 128): rows (i, jb) of 8 px
            planes.append(_requant(yde * inv_ref[0], jnp.int8)
                          .reshape(ib * hh * wcl // 128, 128))

    cat = jnp.concatenate(planes, axis=1)              # (R2, 512)
    pp = jax.lax.dot_general(cat, pk_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32).astype(jnp.int8)
    out_ref[...] = pp.reshape(4 * pp.shape[0], 128).reshape(out_ref.shape)


@functools.partial(jax.jit, static_argnames=(
    "p", "c", "h", "relu", "fold", "interpret"))
def conv_prow_up2_pack(x_rows, leaf: dict, p: int, c: int, h: int,
                       relu: bool = True, fold: int = 2,
                       interpret: bool = False):
    """The serving tail in one custom call: conv (c->16 at h², folded p) +
    fused align-corners x2 to (2h)² + space-to-depth packing -> the
    256²-level packed pair rows (N, h*h/2, 128) int8, lanes (px, q, r, ch)
    — conv_i8_exact_dual's x input form, at the up scale (leaf rc/cc/inv
    from up2_coeffs(h, h, 16, s_mid, s_up))."""
    n, r_img, lanes = x_rows.shape
    c_out = 16
    assert lanes * fold == p * c, (lanes, fold, p, c)
    gpi = h // p
    mxu = "rm" in leaf
    wcl = h * c_out
    per_img = r_img * (9 * lanes + 12 * 128) + (30 if mxu else 24) * h * wcl
    ib = _clamp_ib(n, per_img)
    r_out = h * (h // 2)
    if mxu:
        cdeltas = _up2_cdeltas(h)
        return pl.pallas_call(
            functools.partial(_conv_up2_pack_mxu_kernel, c=c, p=p,
                              r_img=r_img, gpi=gpi, hh=h, ib=ib, relu=relu,
                              cdeltas=cdeltas, c_out=c_out, fold=fold),
            grid=(n // ib,),
            in_specs=[_img_block(ib, r_img, lanes),
                      _wspec(leaf["wm"].shape), _wspec(leaf["wc"].shape),
                      _wspec((1, p * c_out)), _wspec((1, p * c_out)),
                      _wspec((2 * h, h)),
                      _wspec((2, len(cdeltas), wcl)),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      _wspec((512, 512))],
            out_specs=_img_block(ib, r_out, 128),
            out_shape=jax.ShapeDtypeStruct((n, r_out, 128), jnp.int8),
            interpret=interpret,
        )(x_rows, leaf["wm"], leaf["wc"], _vec(leaf["scale"]),
          _vec(leaf["bias"]), jnp.asarray(leaf["rm"], jnp.bfloat16),
          jnp.asarray(leaf["cc"]), jnp.asarray(leaf["inv"]).reshape(1),
          jnp.asarray(_pack_pairrow_matrix()))
    deltas = _up2_deltas(h, h)
    nd = len(deltas)
    rc = jnp.tile(jnp.asarray(leaf["rc"]), (1, 1, ib, 1))
    return pl.pallas_call(
        functools.partial(_conv_up2_pack_kernel, c=c, p=p, r_img=r_img,
                          gpi=gpi, hh=h, ib=ib, relu=relu, deltas=deltas,
                          c_out=c_out, fold=fold),
        grid=(n // ib,),
        in_specs=[_img_block(ib, r_img, lanes),
                  _wspec(leaf["wm"].shape), _wspec(leaf["wc"].shape),
                  _wspec((1, p * c_out)), _wspec((1, p * c_out)),
                  _wspec((2, nd, ib * h, 1)),
                  _wspec((2, nd, wcl)),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  _wspec((512, 512))],
        out_specs=_img_block(ib, r_out, 128),
        out_shape=jax.ShapeDtypeStruct((n, r_out, 128), jnp.int8),
        interpret=interpret,
    )(x_rows, leaf["wm"], leaf["wc"], _vec(leaf["scale"]), _vec(leaf["bias"]),
      rc, jnp.asarray(leaf["cc"]), jnp.asarray(leaf["inv"]).reshape(1),
      jnp.asarray(_pack_pairrow_matrix()))


@functools.partial(jax.jit, static_argnames=(
    "p", "c", "c_out", "p_out", "h", "w", "relu", "fold", "interpret"))
def conv_prow_up2(x_rows, leaf: dict, p: int, c: int, c_out: int, p_out: int,
                  h: int, w: int, relu: bool = True, fold: int = 1,
                  interpret: bool = False):
    """Exact p-row conv + fused align-corners bilinear x2 upsample.

    Returns (N, 2H * 2W/p_out, p_out*c_out) int8 — the rows form of the
    x2-upsampled requantized output at the consumer's p_out, with e-major
    p-groups (absorb with pack_prow_weights(in_perm=up2_perm(p_out))).
    leaf needs 'deltas'/'rc'/'cc' (from up2_coeffs) besides the conv
    weights; the conv epilogue requantizes at the mid scale (exactly the
    standalone conv_prow), and the upsample dequant/requant scales are
    folded into rc/cc.

    fold=k folds k consecutive input rows into lanes in the prologue
    (x_rows lanes * k == p * c): used to run a conv whose natural
    p*c_out would be 64 lanes at doubled p instead, keeping every
    intermediate at >= 128 lanes. p/c/p_out/h/w and the leaf all refer to
    the FOLDED geometry."""
    n, r_img, lanes = x_rows.shape
    assert lanes * fold == p * c, (lanes, fold, p, c)
    gpi = w // p
    lanes_out = p * c_out
    assert lanes_out == 128, lanes_out
    assert (p_out // 2) * c_out == 64, (p_out, c_out)
    gpi_out = (2 * w) // p_out
    r_out = 2 * h * gpi_out
    # the x2 planes (4x f32 (h, w*c_out)) dominate the footprint
    per_img = r_img * (9 * lanes + 12 * lanes_out) + 20 * h * w * c_out
    if "rm" in leaf:
        cdeltas = _up2_cdeltas(w)
        ib = _clamp_ib(n, per_img + 10 * h * w * c_out)
        return pl.pallas_call(
            functools.partial(_conv_up2_mxu_kernel, c=c, p=p, r_img=r_img,
                              gpi=gpi, hh=h, ib=ib, relu=relu,
                              cdeltas=cdeltas, c_out=c_out, p_out=p_out,
                              fold=fold),
            grid=(n // ib,),
            in_specs=[_img_block(ib, r_img, lanes),
                      _wspec(leaf["wm"].shape), _wspec(leaf["wc"].shape),
                      _wspec((1, lanes_out)), _wspec((1, lanes_out)),
                      _wspec((2 * h, h)),
                      _wspec((2, len(cdeltas), w * c_out)),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=_img_block(ib, r_out, p_out * c_out),
            out_shape=jax.ShapeDtypeStruct((n, r_out, p_out * c_out),
                                           jnp.int8),
            interpret=interpret,
        )(x_rows, leaf["wm"], leaf["wc"], _vec(leaf["scale"]),
          _vec(leaf["bias"]), jnp.asarray(leaf["rm"], jnp.bfloat16),
          jnp.asarray(leaf["cc"]), jnp.asarray(leaf["inv"]).reshape(1))
    deltas = _up2_deltas(h, w)
    nd = len(deltas)
    ib = _clamp_ib(n, per_img)
    rc = jnp.tile(jnp.asarray(leaf["rc"]), (1, 1, ib, 1))
    return pl.pallas_call(
        functools.partial(_conv_up2_kernel, c=c, p=p, r_img=r_img, gpi=gpi,
                          hh=h, ib=ib, relu=relu, deltas=deltas,
                          c_out=c_out, p_out=p_out, fold=fold),
        grid=(n // ib,),
        in_specs=[_img_block(ib, r_img, lanes),
                  _wspec(leaf["wm"].shape), _wspec(leaf["wc"].shape),
                  _wspec((1, lanes_out)), _wspec((1, lanes_out)),
                  _wspec((2, nd, ib * h, 1)),
                  _wspec((2, nd, w * c_out)),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=_img_block(ib, r_out, p_out * c_out),
        out_shape=jax.ShapeDtypeStruct((n, r_out, p_out * c_out), jnp.int8),
        interpret=interpret,
    )(x_rows, leaf["wm"], leaf["wc"], _vec(leaf["scale"]), _vec(leaf["bias"]),
      rc, jnp.asarray(leaf["cc"]), jnp.asarray(leaf["inv"]).reshape(1))
