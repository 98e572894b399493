"""int8 x space-to-depth packed serving — the two serving optimisations
composed.

Hypothesis: the int8 path's residual cost is its quantize/pad elementwise
passes over 256²x16 tensors; the packed layout runs those layers at 128²x64
while the convs stay int8.

Measured verdict (v5e, batch 1024): accuracy holds (0.067 K held-out RMSE,
same as plain int8) but throughput is LOWER — 4.1k patches/s vs 5.9k for
plain int8-static. With int8 already shrinking the elementwise bytes 4x, the
packed layout's channel-permutation pad gathers and packed concats cost more
than they save. Kept as a working, tested path because the composition is
non-obvious and the negative result is worth preserving; `bench.py` races
only the winning paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sifsr_tpu.models.packed import (
    _pad_perms,
    _packed_concat,
    _packed_resize,
    _phase_matrices,
    _depth_to_space,
    _space_to_depth,
    _replicate_pad_packed,
    pack_serving_params,
)
from sifsr_tpu.models.quantized import _quantize_kernel

__all__ = ["quantize_packed_params", "int8_packed_forward", "make_int8_packed_sr_step"]


def _qleaf(kernel, bias) -> dict:
    q, s = _quantize_kernel(np.asarray(kernel))
    return {
        "q": jnp.asarray(q),
        "scale": jnp.asarray(s),
        "bias": jnp.asarray(np.asarray(bias, np.float32)),
    }


def quantize_packed_params(variables: dict) -> dict:
    """Packed serving params with every conv quantized to int8."""
    pp = jax.device_get(pack_serving_params(variables))

    def walk_mid(node):
        if isinstance(node, dict) and "kernel" in node:
            return _qleaf(node["kernel"], node["bias"])
        return {k: walk_mid(v) for k, v in node.items()}

    # the level-0 layers (inbloc/ub3/outlay) run in packed form — drop their
    # unpacked copies so calibration covers exactly the consumed convs
    mid = {k: v for k, v in pp["mid"].items() if k not in ("inbloc", "ub3", "outlay")}
    return {
        "mid": walk_mid(mid),
        "packed": {k: _qleaf(*v) for k, v in pp["packed"].items()},
    }


def _conv_i8_generic(x, leaf, pad_fn, relu=True):
    s_x = leaf.get("in_scale")
    xf = x.astype(jnp.float32)
    if s_x is None:
        s_x = jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True), 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    x_q = pad_fn(x_q)
    y = lax.conv_general_dilated(
        x_q, leaf["q"], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_x * leaf["scale"]) + leaf["bias"]
    return jnp.maximum(y, 0.0) if relu else y


def _pad_edge(x):
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")


def _conv_i8_mid(x, leaf, relu=True):
    return _conv_i8_generic(x, leaf, _pad_edge, relu)


def _conv_i8_packed(x, leaf, c_in, relu=True):
    return _conv_i8_generic(x, leaf, lambda q: _replicate_pad_packed(q, c_in), relu)


def _double_mid(x, tree):
    x = _conv_i8_mid(x, tree["conv1"]["conv"])
    return _conv_i8_mid(x, tree["conv2"]["conv"])


def _down_body(x, tree):
    x = x + _double_mid(x, tree["res"])
    return _conv_i8_mid(x, tree["lastconv"]["conv"])


def _down(x, tree):
    n, h, w, c = x.shape
    x = jnp.mean(x.reshape(n, h // 2, 2, w // 2, 2, c), axis=(2, 4))
    return _down_body(x, tree)


def int8_packed_forward(params: dict, lst_up_packed, ndvi_packed, c0: int = 16):
    from sifsr_tpu.models.fused import upsample_bilinear_x2_nhwc

    mid, pk = params["mid"], params["packed"]
    x = _packed_concat(lst_up_packed, 1, ndvi_packed, 1)
    x = _conv_i8_packed(x, pk["in_conv1"], c_in=2)
    s0p = _conv_i8_packed(x, pk["in_conv2"], c_in=c0)

    n, h, w, _ = s0p.shape
    s1_in = s0p.reshape(n, h, w, 4, c0).mean(axis=3)
    s1 = _down_body(s1_in, mid["db1"])
    s2 = _down(s1, mid["db2"])
    x = _down(s2, mid["db3"])

    x = jnp.concatenate([upsample_bilinear_x2_nhwc(x), s2], axis=-1)
    x = _double_mid(x, mid["ub1"]["convbloc"])
    x = jnp.concatenate([upsample_bilinear_x2_nhwc(x), s1], axis=-1)
    x = _double_mid(x, mid["ub2"]["convbloc"])

    phases = jnp.asarray(_phase_matrices(x.shape[1], 2 * x.shape[1], "linear_ac"))
    up_p = _packed_resize(x, phases)
    x = _packed_concat(up_p, c0, s0p, c0)
    x = _conv_i8_packed(x, pk["ub3_conv1"], c_in=2 * c0)
    x = _conv_i8_packed(x, pk["ub3_conv2"], c_in=c0)
    return _conv_i8_packed(x, pk["outlay"], c_in=c0, relu=False)


def calibrate_packed_scales(variables, qparams, sample_lst, sample_ndvi, stats,
                            headroom: float = 1.05) -> dict:
    """Mirror the packed f32 forward on calibration patches, recording each
    conv's input max, and attach static 'in_scale' entries."""
    from sifsr_tpu.models.fused import upsample_bilinear_x2_nhwc
    from sifsr_tpu.ops.resize import resize_matrix  # noqa: F401 (phase cache)

    pp = pack_serving_params(variables)
    scales: dict = {}

    def rec(path, arr):
        scales[path] = float(jnp.max(jnp.abs(arr))) / 127.0 * headroom

    def conv_mid(x, tree, path, relu=True):
        rec(path, x)
        xx = _pad_edge(x)
        y = lax.conv_general_dilated(
            xx, jnp.asarray(tree["kernel"]), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
        ) + jnp.asarray(tree["bias"])
        return jnp.maximum(y, 0.0) if relu else y

    def conv_packed(x, wp_bp, path, c_in, relu=True):
        rec(path, x)
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
    phases_in = jnp.asarray(_phase_matrices(h, 4 * h, "cubic"))
    lst_up_p = _packed_resize(lst_n[..., None], phases_in)
    ndvi_p = _space_to_depth(ndvi_n[..., None])

    mid, pk = pp["mid"], pp["packed"]
    c0 = 16
    x = _packed_concat(lst_up_p, 1, ndvi_p, 1)
    x = conv_packed(x, pk["in_conv1"], ("packed", "in_conv1"), 2)
    s0p = conv_packed(x, pk["in_conv2"], ("packed", "in_conv2"), c0)

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

    s1_in = s0p.reshape(n, hh, ww, 4, c0).mean(axis=3)
    s1 = down_body(s1_in, mid["db1"], ("mid", "db1"))
    s2 = down(s1, mid["db2"], ("mid", "db2"))
    t = down(s2, mid["db3"], ("mid", "db3"))
    t = double_mid(jnp.concatenate([upsample_bilinear_x2_nhwc(t), s2], -1),
                   mid["ub1"]["convbloc"], ("mid", "ub1", "convbloc"))
    t = double_mid(jnp.concatenate([upsample_bilinear_x2_nhwc(t), s1], -1),
                   mid["ub2"]["convbloc"], ("mid", "ub2", "convbloc"))
    phases = jnp.asarray(_phase_matrices(t.shape[1], 2 * t.shape[1], "linear_ac"))
    up_p = _packed_resize(t, phases)
    t = _packed_concat(up_p, c0, s0p, c0)
    t = conv_packed(t, pk["ub3_conv1"], ("packed", "ub3_conv1"), 2 * c0)
    t = conv_packed(t, pk["ub3_conv2"], ("packed", "ub3_conv2"), c0)
    conv_packed(t, pk["outlay"], ("packed", "outlay"), c0, relu=False)

    def attach(node, path=()):
        if isinstance(node, dict) and "q" in node:
            out = dict(node)
            out["in_scale"] = jnp.asarray(scales[path], jnp.float32)
            return out
        return {k: attach(v, path + (k,)) for k, v in node.items()}

    return attach(qparams)


def make_int8_packed_sr_step(stats):
    @jax.jit
    def sr_step(params, lst_blocks, ndvi_blocks):
        lst_n = (lst_blocks - stats.mean_lst) / stats.std_lst
        ndvi_n = (ndvi_blocks - stats.mean_ndvi) / stats.std_ndvi
        h = lst_blocks.shape[1]
        phases = jnp.asarray(_phase_matrices(h, 4 * h, "cubic"))
        lst_up_p = _packed_resize(lst_n[..., None], phases)
        ndvi_p = _space_to_depth(ndvi_n[..., None])
        sr_p = int8_packed_forward(params, lst_up_p, ndvi_p)
        sr = _depth_to_space(sr_p.astype(jnp.float32), 1)[..., 0]
        return sr * stats.std_lst + stats.mean_lst

    return sr_step
