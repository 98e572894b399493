"""int8 quantized serving path — the fast production-serving option.

Measured on TPU v5e: an int8 3x3 conv at the U-Net's shapes runs ~5x faster
than the same conv in bf16 (6.8 ms vs 35.6 ms at batch 512, C=K=16 @256²) —
the int8 MXU path plus 2-4x less memory traffic. This module serves the
BN-folded ModelB with:

- weights: per-output-channel symmetric int8 (scale = max|w_k| / 127),
  quantized once from the folded f32 kernels;
- activations: dynamic per-tensor symmetric int8 (scale = max|x| / 127
  computed on device each layer — one cheap reduction);
- convs: int8 x int8 -> int32 accumulation (preferred_element_type), then
  dequantise, bias, ReLU in f32; replicate padding happens on the int8
  tensor so the big pads move 4x fewer bytes.

Accuracy is NOT bit-exact — quantization error is measured, not assumed:
tests/test_quantized.py bounds the SR output deviation vs the f32 path on
the real released weights (observed ~0.1 K RMSE, far below the ~2 K sensor
accuracy), and the ASTER harness can evaluate the quantized path end-to-end
(cli/model_perf accepts any sr_fn).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sifsr_tpu.models.fused import fold_batchnorm, upsample_bilinear_x2_nhwc

__all__ = ["quantize_serving_params", "int8_forward", "make_int8_sr_step"]


def _quantize_kernel(kernel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """HWIO f32 kernel -> (int8 kernel, per-output-channel scale)."""
    kernel = np.asarray(kernel, np.float64)
    scale = np.abs(kernel).max(axis=(0, 1, 2)) / 127.0
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(kernel / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_serving_params(variables: dict) -> dict:
    """ModelB2 {'params','batch_stats'} -> BN-folded, weight-quantized tree:
    each conv becomes {'q': int8 HWIO, 'scale': (K,), 'bias': (K,)}."""
    folded = jax.device_get(fold_batchnorm(variables))["params"]

    def conv_leaf(tree):
        q, s = _quantize_kernel(tree["kernel"])
        return {
            "q": jnp.asarray(q),
            "scale": jnp.asarray(s),
            "bias": jnp.asarray(np.asarray(tree["bias"], np.float32)),
        }

    def walk(node):
        if isinstance(node, dict) and "kernel" in node:
            return conv_leaf(node)
        return {k: walk(v) for k, v in node.items()}

    return walk(folded)


def _conv_i8(x: jnp.ndarray, leaf: dict, relu: bool = True) -> jnp.ndarray:
    """NHWC float -> replicate pad -> int8 -> int8 conv -> dequant -> bias
    (+ReLU), emitting bf16 intermediates.

    Activation scale: the calibrated static 'in_scale' when present (lets XLA
    fuse the requant into the previous op's epilogue — no extra reduction
    pass), else a dynamic per-tensor max (one reduction)."""
    xf = x.astype(jnp.float32)
    if "in_scale" in leaf:
        s_x = leaf["in_scale"]  # static calibrated scalar
    else:
        # dynamic PER-SAMPLE scale: scenes differ wildly in dynamic range, a
        # per-batch scalar wastes most of the 8-bit range on outlier patches
        s_x = jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True), 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    x_q = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = lax.conv_general_dilated(
        x_q,
        leaf["q"],
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_x * leaf["scale"]) + leaf["bias"]
    # intermediates stay f32: a bf16 cast here compounds with the activation
    # quantization to ~1 K output RMSE (measured); f32 keeps it at ~0.05 K
    return jnp.maximum(y, 0.0) if relu else y


def _double(x, tree):
    x = _conv_i8(x, tree["conv1"]["conv"])
    return _conv_i8(x, tree["conv2"]["conv"])


def _down(x, tree):
    n, h, w, c = x.shape
    x = jnp.mean(x.reshape(n, h // 2, 2, w // 2, 2, c), axis=(2, 4))
    x = x + _double(x, tree["res"])
    return _conv_i8(x, tree["lastconv"]["conv"])


def _up(x, skip, tree):
    x = upsample_bilinear_x2_nhwc(x)
    x = jnp.concatenate([x, skip], axis=-1)
    return _double(x, tree["convbloc"])


def int8_forward(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Quantized BN-folded forward; x (N, H, W, 2) f32 -> (N, H, W, 1) f32."""
    s0 = _double(x, params["inbloc"])
    s1 = _down(s0, params["db1"])
    s2 = _down(s1, params["db2"])
    x = _down(s2, params["db3"])
    x = _up(x, s2, params["ub1"])
    x = _up(x, s1, params["ub2"])
    x = _up(x, s0, params["ub3"])
    return _conv_i8(x, params["outlay"]["conv"], relu=False)


def make_int8_sr_step(stats):
    """int8 twin of inference.make_sr_step:
    (quantized_params, lst (N,64,64) K, ndvi (N,256,256)) -> (N,256,256) K."""
    from sifsr_tpu.ops.resize import upsample_bicubic

    @jax.jit
    def sr_step(params, lst_blocks, ndvi_blocks):
        lst_n = (lst_blocks - stats.mean_lst) / stats.std_lst
        ndvi_n = (ndvi_blocks - stats.mean_ndvi) / stats.std_ndvi
        lst_up = upsample_bicubic(lst_n, 4)
        x = jnp.stack([lst_up, ndvi_n], axis=-1).astype(jnp.float32)
        sr = int8_forward(params, x)[..., 0]
        return sr * stats.std_lst + stats.mean_lst

    return sr_step


def calibrate_activation_scales(
    variables: dict, qparams: dict, sample_lst, sample_ndvi, stats, headroom: float = 1.05,
    calib_quantile: float | None = None
) -> dict:
    """Run the f32 BN-folded forward on calibration patches, record max|input|
    of every conv, and write static 'in_scale' entries into ``qparams``.

    sample_lst (N,64,64) Kelvin, sample_ndvi (N,256,256). Returns the updated
    quantized tree (in place semantics: new dict).

    calib_quantile: None records batch max|x| per conv input (no clipping on
    calibration data); a quantile (e.g. 0.9999) clips that tail for tighter
    scales (measured tradeoff in cli/model_perf --calib-quantile help)."""
    from sifsr_tpu.ops.resize import upsample_bicubic

    folded = fold_batchnorm(variables)

    lst_n = (jnp.asarray(sample_lst, jnp.float32) - stats.mean_lst) / stats.std_lst
    ndvi_n = (jnp.asarray(sample_ndvi, jnp.float32) - stats.mean_ndvi) / stats.std_ndvi
    x = jnp.stack([upsample_bicubic(lst_n, 4), ndvi_n], axis=-1)

    # mirror the folded forward layer by layer, recording each conv's input max
    scales: dict = {}

    def record(path, arr):
        if calib_quantile is None:
            m = float(jnp.max(jnp.abs(arr)))
        else:
            m = float(jnp.quantile(jnp.abs(arr).ravel(), calib_quantile))
        scales[path] = m / 127.0 * headroom

    def conv_f32(xx, leaf_path, relu=True):
        node = folded["params"]
        for k in leaf_path:
            node = node[k]
        record(leaf_path, xx)
        xx = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        yy = lax.conv_general_dilated(
            xx, jnp.asarray(node["kernel"]), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
        ) + jnp.asarray(node["bias"])
        return jnp.maximum(yy, 0.0) if relu else yy

    def double_f32(xx, base):
        xx = conv_f32(xx, base + ("conv1", "conv"))
        return conv_f32(xx, base + ("conv2", "conv"))

    def down_f32(xx, base):
        n, h, w, c = xx.shape
        xx = jnp.mean(xx.reshape(n, h // 2, 2, w // 2, 2, c), axis=(2, 4))
        xx = xx + double_f32(xx, base + ("res",))
        return conv_f32(xx, base + ("lastconv", "conv"))

    s0 = double_f32(x, ("inbloc",))
    s1 = down_f32(s0, ("db1",))
    s2 = down_f32(s1, ("db2",))
    t = down_f32(s2, ("db3",))
    t = double_f32(jnp.concatenate([upsample_bilinear_x2_nhwc(t), s2], -1), ("ub1", "convbloc"))
    t = double_f32(jnp.concatenate([upsample_bilinear_x2_nhwc(t), s1], -1), ("ub2", "convbloc"))
    t = double_f32(jnp.concatenate([upsample_bilinear_x2_nhwc(t), s0], -1), ("ub3", "convbloc"))
    conv_f32(t, ("outlay", "conv"), relu=False)

    def attach(node, path=()):
        if isinstance(node, dict) and "q" in node:
            out = dict(node)
            out["in_scale"] = jnp.asarray(scales[path], jnp.float32)
            return out
        return {k: attach(v, path + (k,)) for k, v in node.items()}

    return attach(qparams)
