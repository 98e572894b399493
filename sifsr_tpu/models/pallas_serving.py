"""The fastest serving path: int8 + space-to-depth + exact Pallas pair-convs.

Round-5 state: the ENTIRE U-Net runs as chained Pallas kernels (mid='prow',
the default) — 10,245-10,248 patches/s wall / 10,229 device-bound at batch
384 on v5e, over the BASELINE.md >=10k north star (round 3 shipped the
composition at 10,118; round 5 added the integer-exact MXU row-mix x2
upsamples (up2_impl='mxu'), the int8-side ndvi space-to-depth and the
one-concat border paste). Composition:

- every 256²-resolution conv runs in Pallas with zero XLA glue:
  inbloc.conv1 as the in-kernel tap-stacked matmul over SPLIT lst/ndvi
  refs (conv_i8_in1_split), inbloc.conv2 / ub3.conv1 / ub3.conv2 as the
  exact self-padding pair-conv kernels (pallas/conv_i8.py) — consecutive
  kernels exchange rows-form int8 tensors, which is copy-free (all pin the
  {2,1,0} layout);
- the mid chain (db1-db3, ub1-ub2 at 128²/64²/32²) runs as p-row
  banded-matmul kernels (pallas/conv_px.py) with the 2x2 pools, the
  align-corners x2 upsamples and the skip concats fused into conv
  epilogues/prologues (skips read split half-planes; e-major upsample
  groups are absorbed via weight packing); 64-lane convs run at doubled p
  (Mosaic rejects sub-128-lane reshapes);
- the serving tail is ONE call (conv_prow_up2_pack): ub2.conv2 + the final
  x2 + space-to-depth packing to 256²-level pair rows via a fixed 512x512
  int8 lane-permutation matmul (the Mosaic-expressible lane-crossing);
- ub3.conv1's skip concat is never materialised: conv(concat(up, skip)) =
  conv_a(up) + conv_b(skip) with per-half input scales and per-half
  per-channel weight scales;
- the LST cubic x4 runs as a phase-separated Pallas upsample with
  quantisation fused into its epilogue (pallas/resize_phases.py);
- inbloc.conv2 emits the mid-chain phase mean as a fused second output in
  p=8 rows form, already int8-quantized at db1's first-conv input scale;
- outlay is a zero-padded XLA int8 conv (the pad folds into the conv op)
  with exact replicate-pad border strips pasted into the final SR, and the
  Kelvin de-normalise folded into its dequant epilogue;
- mid='xla' keeps the round-2 XLA int8 mid chain (models/quantized_packed)
  as the comparison path.

Everything is calibrated statically from sample patches (per-tensor input
scales with headroom, per-output-channel weight scales), mirroring
models/quantized.calibrate_activation_scales.

Numerical contract: equivalent to the BN-folded ModelB_2 forward (reference
model.py:608-645) within int8 quantization error; measured end-to-end on
the real released weights in tests/test_pallas_serving.py and on the full
80-pair ASTER harness (EVAL_RESULTS.md, results/modelB_1009_pallas_prow/:
RMSE -0.005 K / SSIM -0.002 vs f32; reproduce with cli/model_perf
--serving prow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sifsr_tpu.models.fused import upsample_bilinear_x2_nhwc
from sifsr_tpu.models.packed import (
    _packed_concat,
    _packed_resize,
    _phase_matrices,
    _depth_to_space,
    _replicate_pad_packed,
    _space_to_depth,
    pack_serving_params,
)
from sifsr_tpu.models.quantized import _quantize_kernel
from sifsr_tpu.pallas.conv_i8 import (
    conv_i8_exact,
    conv_i8_exact_dual,
    conv_i8_in1_split,
    in1_split_weights,
    pack_in1_weights,
    pack_row_tap_weights,
)
from sifsr_tpu.pallas.resize_phases import (
    phases_to_packed_x4,
    upsample_phases,
)

__all__ = ["build_pallas_serving_params", "make_pallas_sr_step"]


def _qleaf(kernel, bias) -> dict:
    q, s = _quantize_kernel(np.asarray(kernel))
    return {"q": jnp.asarray(q), "scale": jnp.asarray(s),
            "bias": jnp.asarray(np.asarray(bias, np.float32))}


# ---------------------------------------------------------------- calibration

def _f32_packed_mirror(pp, sample_lst, sample_ndvi, stats, quantile=None):
    """Run the f32 packed forward (models/packed.packed_forward graph) on
    calibration patches, recording max|x| (or the `quantile` of |x|, if
    given) of every tensor that gets an int8 scale. Returns (record dict,
    mid-path input maxes dict)."""
    rec: dict = {}
    mid_rec: dict = {}

    if quantile is None:
        def _amax(x):
            return float(jnp.max(jnp.abs(x)))
    else:
        def _amax(x):
            return float(jnp.quantile(jnp.abs(x).ravel(), quantile))

    def conv_mid(x, tree, path, relu=True):
        mid_rec[path] = _amax(x)
        xx = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        y = lax.conv_general_dilated(
            xx, jnp.asarray(tree["kernel"]), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
        ) + jnp.asarray(tree["bias"])
        return jnp.maximum(y, 0.0) if relu else y

    def conv_packed(x, wp_bp, c_in, relu=True):
        xx = _replicate_pad_packed(x, c_in)
        y = lax.conv_general_dilated(
            xx, jnp.asarray(wp_bp[0]), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
        ) + jnp.asarray(wp_bp[1])
        return jnp.maximum(y, 0.0) if relu else y

    lst_n = (jnp.asarray(sample_lst, jnp.float32) - stats.mean_lst) / stats.std_lst
    ndvi_n = (jnp.asarray(sample_ndvi, jnp.float32) - stats.mean_ndvi) / stats.std_ndvi
    h = sample_lst.shape[1]
    lst_up_p = _packed_resize(lst_n[..., None], jnp.asarray(_phase_matrices(h, 4 * h, "cubic")))
    ndvi_p = _space_to_depth(ndvi_n[..., None])

    mid, pk = pp["mid"], pp["packed"]
    c0 = 16
    x = _packed_concat(lst_up_p, 1, ndvi_p, 1)
    rec["in1"] = _amax(x)
    x = conv_packed(x, pk["in_conv1"], 2)
    rec["in2"] = _amax(x)
    s0p = conv_packed(x, pk["in_conv2"], c0)
    rec["s0"] = _amax(s0p)

    n, hh, ww, _ = s0p.shape

    def double_mid(x, tree, base):
        x = conv_mid(x, tree["conv1"]["conv"], base + ("conv1", "conv"))
        return conv_mid(x, tree["conv2"]["conv"], base + ("conv2", "conv"))

    def down_body(x, tree, base):
        x = x + double_mid(x, tree["res"], base + ("res",))
        return conv_mid(x, tree["lastconv"]["conv"], base + ("lastconv", "conv"))

    def down(x, tree, base):
        nn_, h_, w_, c_ = x.shape
        x = jnp.mean(x.reshape(nn_, h_ // 2, 2, w_ // 2, 2, c_), axis=(2, 4))
        return down_body(x, tree, base)

    def rec_max(key, x):
        rec[key] = _amax(x)
        return x

    s1 = down_body(s0p.reshape(n, hh, ww, 4, c0).mean(axis=3), mid["db1"], ("db1",))
    rec_max("m_s1", s1)
    s2 = down(s1, mid["db2"], ("db2",))
    rec_max("m_s2", s2)
    t = down(s2, mid["db3"], ("db3",))
    rec_max("m_t3", t)
    t = double_mid(jnp.concatenate(
        [rec_max("m_upt3", upsample_bilinear_x2_nhwc(t)), s2], -1),
        mid["ub1"]["convbloc"], ("ub1", "convbloc"))
    rec_max("m_u1", t)
    t = double_mid(jnp.concatenate(
        [rec_max("m_upu1", upsample_bilinear_x2_nhwc(t)), s1], -1),
        mid["ub2"]["convbloc"], ("ub2", "convbloc"))
    rec_max("m_u2", t)
    up_p = _packed_resize(t, jnp.asarray(_phase_matrices(t.shape[1], 2 * t.shape[1], "linear_ac")))
    rec["up"] = _amax(up_p)
    u31 = conv_packed(_packed_concat(up_p, c0, s0p, c0), pk["ub3_conv1"], 2 * c0)
    rec["u32"] = _amax(u31)
    u32 = conv_packed(u31, pk["ub3_conv2"], c0)
    rec["ol"] = _amax(u32)
    return rec, mid_rec


def build_pallas_serving_params(variables: dict, sample_lst, sample_ndvi,
                                stats, headroom: float = 1.05,
                                calib_quantile: float | None = None,
                                up2_impl: str = "mxu") -> dict:
    """ModelB2 variables + calibration patches -> the full parameter tree for
    make_pallas_sr_step. sample_lst (N,64,64) Kelvin, sample_ndvi (N,256,256).

    calib_quantile: None uses batch max|x| per tensor (no clipping on the
    calibration data); a quantile (e.g. 0.9999) clips that tail for tighter
    scales.

    up2_impl: 'mxu' (default) uses the integer-exact MXU row-mix form of the
    fused x2 upsamples (pallas/conv_px.up2_coeffs_mxu — one fewer rounding
    than the VPU stencil form and measurably faster); 'vpu' keeps the
    round-3 roll/fma form (bit-identical to upsample_phases)."""
    pp = jax.device_get(pack_serving_params(variables))
    rec, mid_rec = _f32_packed_mirror(pp, sample_lst, sample_ndvi, stats,
                                      quantile=calib_quantile)
    s = {k: v / 127.0 * headroom for k, v in rec.items()}

    pk = pp["packed"]

    # outlay stays an XLA int8 conv (zero-pad + exact border strips; the
    # pallas tail variant measured slower — see _finish)
    ol = _qleaf(*pk["outlay"])
    ol["in_scale"] = jnp.float32(s["ol"])

    # inbloc.conv1 (packed 8->64) as the in-kernel tap-stacked matmul
    # (conv_i8_in1): weights packed to the K=432 [3 tap rows | 3 tap
    # composites] form, scale/bias tiled to the (o-pair, px, ch) 1024 lanes
    w1, b1 = pk["in_conv1"]
    q1, sw1 = _quantize_kernel(np.asarray(w1))
    comb1 = s["in1"] * sw1 / s["in2"]
    in1 = {
        "w432": jnp.asarray(in1_split_weights(pack_in1_weights(q1))),
        "scale": jnp.asarray(np.tile(comb1, 16).astype(np.float32)),
        "bias": jnp.asarray(np.tile(np.asarray(b1, np.float64) / s["in2"], 16)
                            .astype(np.float32)),
        "in_scale": jnp.float32(s["in1"]),
    }

    def pallas_leaf(wp_bp, s_in, s_out):
        """One single-input pallas layer leaf: int8 row-tap weights + folded
        scale/bias tiled to the 128-lane pair layout (the exact kernel needs
        no border-strip weights)."""
        q, sw = _quantize_kernel(np.asarray(wp_bp[0]))
        wm, wc = pack_row_tap_weights(q)
        comb = s_in * sw
        b = np.asarray(wp_bp[1], np.float64)
        if s_out is not None:
            comb, b = comb / s_out, b / s_out
        return {
            "wm": jnp.asarray(wm), "wc": jnp.asarray(wc),
            "scale": jnp.asarray(np.tile(comb, 2).astype(np.float32)),
            "bias": jnp.asarray(np.tile(b, 2).astype(np.float32)),
        }

    # inbloc.conv2: int8(in2 scale) -> int8(s0 scale)
    in2 = pallas_leaf(pk["in_conv2"], s["in2"], s["s0"])

    # ub3.conv1 split halves: packed input channel j = (qr)*32 + c,
    # c<16 = up path (concat order in packed_forward), c>=16 = skip (s0p)
    w31, b31 = pk["ub3_conv1"]
    w31 = np.asarray(w31).reshape(3, 3, 4, 32, 64)
    wa = w31[:, :, :, :16].reshape(3, 3, 64, 64)
    wb = w31[:, :, :, 16:].reshape(3, 3, 64, 64)
    qa, swa = _quantize_kernel(wa)
    qb, swb = _quantize_kernel(wb)
    wm_x, wc_x = pack_row_tap_weights(qa)
    wm_z, wc_z = pack_row_tap_weights(qb)
    sx = s["up"] * swa / s["u32"]
    sz = s["s0"] * swb / s["u32"]
    b31f = np.asarray(b31, np.float64) / s["u32"]
    u31 = {
        "wm_x": jnp.asarray(wm_x), "wc_x": jnp.asarray(wc_x),
        "wm_z": jnp.asarray(wm_z), "wc_z": jnp.asarray(wc_z),
        "scale_x": jnp.asarray(np.tile(sx, 2).astype(np.float32)),
        "scale_z": jnp.asarray(np.tile(sz, 2).astype(np.float32)),
        "bias": jnp.asarray(np.tile(b31f, 2).astype(np.float32)),
    }

    # ub3.conv2: int8(u32) -> int8(ol)
    u32 = pallas_leaf(pk["ub3_conv2"], s["u32"], s["ol"])

    # mid chain: per-conv int8 leaves with calibrated static input scales
    # mid chain stays int8 XLA: a bf16-mid experiment (round 2) measured
    # 6.0k vs 6.8k patches/s — XLA's int8 convs beat its bf16 convs at
    # these channel counts even counting the quant/dequant passes
    def walk_mid(node, base=()):
        if isinstance(node, dict) and "kernel" in node:
            leaf = _qleaf(node["kernel"], node["bias"])
            leaf["in_scale"] = jnp.float32(mid_rec[base] / 127.0 * headroom)
            return leaf
        return {k: walk_mid(v, base + (k,)) for k, v in node.items()}

    mid = {k: walk_mid(v, (k,)) for k, v in pp["mid"].items()
           if k not in ("inbloc", "ub3", "outlay")}

    pmid = _build_prow_mid(pp["mid"], mid_rec, s, headroom,
                           2 * np.asarray(sample_lst).shape[1],
                           up2_impl=up2_impl)

    return {
        "in1": in1, "in2": in2, "u31": u31, "u32": u32, "ol": ol, "mid": mid,
        "pmid": pmid,
        "s": {k: jnp.float32(v) for k, v in s.items()},
    }


def _build_prow_mid(mid_tree, mid_rec, s, headroom, hp, up2_impl="mxu"):
    """Pallas p-row parameter tree for the mid chain (pallas/conv_px).
    hp: the packed level-0 size (2 * LST size); the fused-upsample stencil
    coefficient tables bind the prow params to this serving shape.

    Per-conv static input scales come from the same mirror calibration as
    the XLA int8 mid; inter-level emission scales (m_*) are the recorded
    tensor maxes. Layout per block: p-pixel rows with p*C = 128 lanes
    (db1 p=8/C=16 at 128², db2 p=4/C=32 at 64², db3+ub1 p=2/C=64,
    ub2 p=4 dual 32-channel halves at 128²). ALL inter-level glue is fused
    into the kernels: the 2x2 pools live in the DownBlock lastconv epilogue
    (pool_sc), the x2 upsamples in db3.last/ub1.conv2 (up2 coeffs, emitting
    e-major groups absorbed by the consumer's in_perm weight packing), and
    the skip concats consume the producer's split half-planes directly.
    The 64-lane-out convs (ub1/ub2 conv2) run at doubled p via fold."""
    from sifsr_tpu.pallas.conv_px import (
        prow_leaf, up2_coeffs, up2_coeffs_mxu, up2_perm)

    assert up2_impl in ("vpu", "mxu"), up2_impl

    def cal(*path):
        return mid_rec[tuple(path)] / 127.0 * headroom

    def k_b(node):
        return np.asarray(node["conv"]["kernel"]), np.asarray(node["conv"]["bias"])

    def attach_up2(leaf, h, w, c_out, s_mid, s_up):
        if up2_impl == "mxu":
            _, rm, cc, inv = up2_coeffs_mxu(h, w, c_out, s_mid, s_up)
            leaf["rm"] = jnp.asarray(rm)
        else:
            _, rc, cc, inv = up2_coeffs(h, w, c_out, s_mid, s_up)
            leaf["rc"] = jnp.asarray(rc)
        leaf["cc"] = jnp.asarray(cc)
        leaf["inv"] = jnp.asarray(inv)
        return leaf

    def down_leaves(name, p):
        tree = mid_tree[name]
        k1, b1 = k_b(tree["res"]["conv1"])
        k2, b2 = k_b(tree["res"]["conv2"])
        kl, bl = k_b(tree["lastconv"])
        s_in = cal(name, "res", "conv1", "conv")
        s_c2 = cal(name, "res", "conv2", "conv")
        s_lc = cal(name, "lastconv", "conv")
        s_out = s[{"db1": "m_s1", "db2": "m_s2", "db3": "m_t3"}[name]]
        conv1 = prow_leaf(k1, b1, p, s_in, s_c2)
        conv2 = prow_leaf(k2, b2, p, s_c2, None, post_scale=1.0 / s_lc)
        conv2["res_sc"] = jnp.full((p * k1.shape[2],),
                                   np.float32(s_in / s_lc))
        last = prow_leaf(kl, bl, p, s_lc, s_out)
        if name in ("db1", "db2"):                  # fused 2x2 pool
            s_next = cal({"db1": "db2", "db2": "db3"}[name],
                         "res", "conv1", "conv")
            last["pool_sc"] = jnp.full((128,), np.float32(s_out / (4 * s_next)))
        else:                                       # db3: fused x2 upsample
            attach_up2(last, hp // 4, hp // 4, 64, s["m_t3"], s["m_upt3"])
        return {"conv1": conv1, "conv2": conv2, "last": last}

    def up_leaves(name, p, s_x, s_z):
        tree = mid_tree[name]["convbloc"]
        k1, b1 = k_b(tree["conv1"])
        k2, b2 = k_b(tree["conv2"])
        s_c2 = cal(name, "convbloc", "conv2", "conv")
        s_out = s[{"ub1": "m_u1", "ub2": "m_u2"}[name]]
        half = k1.shape[2] // 2
        perm = up2_perm(p) if p > 2 else None       # x input is up2 output
        conv1x = prow_leaf(k1[:, :, :half], b1, p, s_x, s_c2, in_perm=perm)
        conv1z = prow_leaf(k1[:, :, half:], np.zeros_like(b1), p, s_z, s_c2)
        # conv2 at doubled p (fold=2): p*c_out stays 128 lanes
        conv2 = prow_leaf(k2, b2, 2 * p, s_c2, s_out)
        if name == "ub1":                           # fused x2 upsample
            attach_up2(conv2, hp // 2, hp // 2, 32, s["m_u1"], s["m_upu1"])
        else:                                       # ub2: the serving tail
            attach_up2(conv2, hp, hp, 16, s["m_u2"], s["up"])
        return {"conv1x": conv1x, "conv1z": conv1z, "conv2": conv2}

    return {
        "db1": down_leaves("db1", 8),
        "db2": down_leaves("db2", 4),
        "db3": down_leaves("db3", 2),
        "ub1": up_leaves("ub1", 2, s["m_upt3"], s["m_s2"]),
        "ub2": up_leaves("ub2", 4, s["m_upu1"], s["m_s1"]),
        "s": {k: jnp.float32(s[k]) for k in
              ("m_s1", "m_s2", "m_t3", "m_upt3", "m_u1", "m_upu1", "m_u2")},
    }


# -------------------------------------------------------------- serving step

def _quant(x, scale):
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def _pool_quant_i8(x_i8, s_in, s_out):
    """Exact 2x2 avg pool + requant on an int8 NHWC tensor: the 4-px int8
    sum fits int32, one f32 multiply folds mean and rescale."""
    n, h, w, c = x_i8.shape
    acc = jnp.sum(x_i8.astype(jnp.int32).reshape(n, h // 2, 2, w // 2, 2, c),
                  axis=(2, 4))
    return _quant(acc.astype(jnp.float32), 4.0 * s_out / s_in)


def _prow_mid(pmid, pm_rows, hp: int, interpret: bool):
    """The U-Net mid chain (db1..db3, ub1, ub2 — reference model.py:596-604)
    as a pure pallas chain: pm_rows (N, 2048, 128) int8 (p=8 rows at 128²,
    already at db1.conv1's input scale, straight from conv_i8_exact's fused
    phase-mean output) -> (u2_rows (N, 2048, 128) int8 p=8/C=16 at 128²,
    its dequant scale). ZERO XLA ops between the custom calls: pools live in
    the DownBlock last-conv epilogues, x2 upsamples in db3.last/ub1.conv2
    epilogues, skip concats read the split half-planes directly."""
    from sifsr_tpu.pallas.conv_px import (
        conv_prow, conv_prow_dual_planes, conv_prow_split_pool,
        conv_prow_up2, conv_prow_up2_pack)

    def down(name, x, p, c, h):
        tree = pmid[name]
        a = conv_prow(x, tree["conv1"], p, c, c, h, h, interpret=interpret)
        return conv_prow(a, tree["conv2"], p, c, c, h, h, residual=x,
                         interpret=interpret)

    h2, h3 = hp // 2, hp // 4
    db1 = down("db1", pm_rows, 8, 16, hp)
    s1lo, s1hi, x2 = conv_prow_split_pool(db1, pmid["db1"]["last"],
                                          8, 16, 32, hp, hp,
                                          interpret=interpret)
    db2 = down("db2", x2, 4, 32, h2)
    s2lo, s2hi, x3 = conv_prow_split_pool(db2, pmid["db2"]["last"],
                                          4, 32, 64, h2, h2,
                                          interpret=interpret)
    db3 = down("db3", x3, 2, 64, h3)
    up3 = conv_prow_up2(db3, pmid["db3"]["last"], 2, 64, 64, 2, h3, h3,
                        interpret=interpret)             # h2² p=2 rows
    # reference UpBlock's DoubleConvolution narrows in two steps:
    # conv1 concat(2c) -> c1, conv2 c1 -> c2 (model.py:161-248)
    ub1 = pmid["ub1"]
    u1a = conv_prow_dual_planes(up3, s2lo, s2hi, ub1["conv1x"],
                                ub1["conv1z"], 2, 64, 64, h2, h2,
                                interpret=interpret)
    upu1 = conv_prow_up2(u1a, ub1["conv2"], 4, 64, 32, 4, h2, h2, fold=2,
                         interpret=interpret)            # hp² p=4 rows
    ub2 = pmid["ub2"]
    u2a = conv_prow_dual_planes(upu1, s1lo, s1hi, ub2["conv1x"],
                                ub2["conv1z"], 4, 32, 32, hp, hp,
                                interpret=interpret)
    # the serving tail: ub2.conv2 + the final x2 + packing to the
    # 256²-level pair rows, one custom call (N, hp*hp/2, 128) at up scale
    return conv_prow_up2_pack(u2a, ub2["conv2"], 8, 32, hp, fold=2,
                              interpret=interpret)


def make_pallas_sr_step(stats, interpret: bool | None = None, mesh=None,
                        mid: str = "prow"):
    """Pallas-serving twin of inference.make_sr_step:
    (params, lst (N,64,64) K, ndvi (N,256,256)) -> (N,256,256) K.
    interpret defaults to True off-TPU (pallas interpreter for CPU tests).

    mid: 'prow' (default) runs the whole mid chain as p-row pallas kernels
    (pallas/conv_px) — the round-3 fast path (10.1k patches/s wall at batch
    384, 80-pair harness RMSE -0.005 K vs f32) that removes the XLA mid's
    quant/dequant elementwise passes and most XLA<->Pallas relayout copies;
    'xla' keeps the round-2 XLA int8 mid chain.

    mesh: a jax.sharding.Mesh with a 'data' axis runs the step data-parallel
    via shard_map (GSPMD would otherwise replicate through the pallas custom
    calls); each device runs its batch shard's kernel grids independently —
    no collectives on the serving path."""
    from sifsr_tpu.models.quantized_packed import _conv_i8_mid, _double_mid, _down

    assert mid in ("xla", "prow"), mid
    use_prow = mid == "prow"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def _finish(params, up_q, s0p, hp):
        """Shared tail: packed x2 output (pair-row lane order) -> ub3 dual
        conv -> ub3.conv2 -> outlay + exact border strips -> Kelvin SR."""
        d = params["u31"]
        u31 = conv_i8_exact_dual(up_q, s0p,
                                 d["wm_x"], d["wc_x"], d["wm_z"], d["wc_z"],
                                 d["scale_x"], d["scale_z"], d["bias"],
                                 hp, hp, interpret=interpret)
        u2 = params["u32"]
        olp = conv_i8_exact(u31, u2["wm"], u2["wc"], u2["scale"], u2["bias"],
                            hp, hp, slab=hp, interpret=interpret)

        # outlay stays an XLA int8 conv (zero-pad + exact border strips).
        # A pallas tail variant (conv_i8_outlay — olp consumed copy-free,
        # exact in-kernel replicate borders, fused de-normalise) was built
        # and measured SLOWER in round 4: its 8-useful-lane output makes the
        # kernel 3.1 ms/iter and the f32 (N, hp·wb, 8) -> (N, 256, 256)
        # transpose 2.3 ms (the 8-lane minor dim wastes 15/16 of every vreg
        # in the relayout), vs the 1.6 ms copy.140 + ~1 ms XLA outlay chain
        # it replaces (9.6k vs 10.2k device-bound at batch 384). The kernel
        # stays exactness-tested (tests/test_conv_i8_pallas.py) as the
        # documented negative result; see FUTURE.md.
        # The Kelvin de-normalise folds linearly into the dequant epilogue
        # (scale*std, bias*std+mean) — a separate full-tensor multiply_add
        # pass profiled at ~0.5 ms/iter at batch 256.
        ol = params["ol"]
        ol_sc = ol["in_scale"] * ol["scale"] * stats.std_lst
        ol_b = ol["bias"] * stats.std_lst + stats.mean_lst
        yol = lax.conv_general_dilated(
            olp, ol["q"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * ol_sc + ol_b
        sr = _depth_to_space(yol, 1)[..., 0]

        def strip(part, take_h, take_w):
            """Exact outlay on a thin 2-packed-px slice of olp: the packed
            replicate pad is applied to the slice only (the far-side pad row
            it fabricates lands outside the taken outputs)."""
            y = lax.conv_general_dilated(
                _replicate_pad_packed(part, 16), ol["q"], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * ol_sc + ol_b
            return _depth_to_space(y[:, take_h, take_w], 1)[..., 0]

        # border paste as ONE concat materialization (bit-identical to the
        # former .at[].set chain: left/right strips own the corners, exactly
        # as the last-writer-wins DUS order did). Four dynamic-update-slices
        # on the (N, 256, 256) f32 output forced XLA to materialise copy
        # passes of the full tensor; the concat writes every byte once.
        all_ = slice(None)
        top = strip(olp[:, 0:2], slice(0, 1), all_)          # (N, 2, W)
        bot = strip(olp[:, -2:], slice(1, 2), all_)
        left = strip(olp[:, :, 0:2], all_, slice(0, 1))      # (N, H, 2)
        right = strip(olp[:, :, -2:], all_, slice(1, 2))
        center = jnp.concatenate(
            [top[:, :, 2:-2], sr[:, 2:-2, 2:-2], bot[:, :, 2:-2]], axis=1)
        return jnp.concatenate([left, center, right], axis=2)

    @jax.jit
    def sr_step(params, lst_blocks, ndvi_blocks):
        mid, s = params["mid"], params["s"]
        lst_n = (lst_blocks - stats.mean_lst) / stats.std_lst
        ndvi_n = (ndvi_blocks - stats.mean_ndvi) / stats.std_ndvi
        n = lst_blocks.shape[0]
        h = lst_blocks.shape[1]
        hp = 2 * h
        wb = hp // 2
        # pallas phase-separated cubic x4 with the in1-scale quantisation
        # fused into its epilogue (XLA resize formulations all lose badly
        # here — see pallas/resize_phases.py)
        in1 = params["in1"]
        lst_q = phases_to_packed_x4(upsample_phases(
            lst_n[..., None], 4, "cubic", out_dtype=jnp.int8,
            scale=in1["in_scale"], interpret=interpret))     # (N,hp,hp,4) i8
        # quantize BEFORE the space-to-depth relayout: the elementwise quant
        # commutes with the transpose bit-for-bit, and the relayout then
        # moves int8 (25 MB at batch 384) instead of f32 (100 MB)
        ndvi_q = _space_to_depth(_quant(ndvi_n[..., None], in1["in_scale"]))

        # inbloc.conv1 (in-kernel tap stack, conv_i8_in1_split): the 3x3
        # packed neighbourhood is assembled in-register from 16-px rows (row
        # shifts + pad permutation matmuls), and the lst/ndvi sources stay
        # SEPARATE refs K-concatenated in-register — the round-2 prestacked
        # form spent ~5.9 ms/iter of XLA concat+relayout building the x144
        # tensor, and the interleaved single-ref form still paid ~0.5 ms of
        # channel-interleave reshapes. Output is already pixel-pair rows,
        # feeding inbloc.conv2 pallas-to-pallas.
        s1q = conv_i8_in1_split(lst_q, ndvi_q, in1["w432"], in1["scale"],
                                in1["bias"], hp, hp,
                                interpret=interpret).reshape(n, hp, hp, 64)

        # inbloc.conv2 (exact pallas, one custom call) -> s0p int8 at the s0
        # scale + the mid-chain phase mean fused as a second output, emitted
        # ALREADY int8-quantized at db1's first-conv input scale: quarters
        # the boundary copy and feeds that conv pre-quantized
        in2 = params["in2"]
        db1 = mid["db1"]
        s_db1 = db1["res"]["conv1"]["conv"]["in_scale"]
        s0p, pm = conv_i8_exact(s1q, in2["wm"], in2["wc"], in2["scale"],
                                in2["bias"], hp, hp,
                                phase_mean=s["s0"] / s_db1,
                                pm_dtype=jnp.int8, pm_rows=use_prow,
                                slab=hp, interpret=interpret)

        if use_prow:
            up_q = _prow_mid(params["pmid"], pm, hp, interpret)
            return _finish(params, up_q.reshape(n, hp, hp, 64), s0p, hp)
        pm = pm.reshape(n, hp, hp, 16)

        def mid_conv_prequant(x_q, s_x, leaf, relu=True):
            xq = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            y = lax.conv_general_dilated(
                xq, leaf["q"], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (s_x * leaf["scale"]) + leaf["bias"]
            return jnp.maximum(y, 0.0) if relu else y

        r = mid_conv_prequant(pm, s_db1, db1["res"]["conv1"]["conv"])
        r = _conv_i8_mid(r, db1["res"]["conv2"]["conv"])
        res = pm.astype(jnp.float32) * s_db1 + r
        s1m = _conv_i8_mid(res, db1["lastconv"]["conv"])
        s2 = _down(s1m, mid["db2"])
        t = _down(s2, mid["db3"])
        # ub1/ub2 upsamples stay on the XLA einsum: their tensors live in
        # XLA-chosen (batch-minor) layouts on both sides, so a pallas hop
        # here buys two relayout copies that cost more than the einsum
        t = _double_mid(jnp.concatenate([upsample_bilinear_x2_nhwc(t), s2], -1),
                        mid["ub1"]["convbloc"])
        t = _double_mid(jnp.concatenate([upsample_bilinear_x2_nhwc(t), s1m], -1),
                        mid["ub2"]["convbloc"])

        # ub3.conv1 (exact pallas dual: up-path + skip, concat-free); the
        # x2 upsample quantizes to the up scale inside the phase kernel.
        # ub3 conv1 (dual) then conv2 stay separate kernels: a fused chained
        # variant measured a wash (round-2 profile).
        y6 = upsample_phases(t, 2, "linear_ac", out_dtype=jnp.int8,
                             scale=s["up"], interpret=interpret)
        # one explicit 7D transpose straight to pair-rows packed form
        # (n, d, e, i, (jp, px), c) -> (n, i, jp, px, d, e, c)
        up_q = y6.reshape(n, 2, 2, hp, wb, 2, 16).transpose(
            0, 3, 4, 5, 1, 2, 6).reshape(n, hp, hp, 64)
        return _finish(params, up_q, s0p, hp)

    if mesh is None:
        return sr_step

    from jax.sharding import PartitionSpec as P

    sharded = jax.shard_map(
        sr_step, mesh=mesh,
        in_specs=(P(), P("data"), P("data")), out_specs=P("data"),
        check_vma=False,
    )
    return jax.jit(sharded)
