"""Inference-optimised ModelB: BatchNorm folded into conv weights.

Profiling the serving step on TPU v5e showed the eval-mode forward spending
~40% of device time in BN+ReLU elementwise fusions and layout copies — the
convs themselves are only ~half the step. At inference BN is an affine map
with frozen statistics, so it folds exactly into the preceding conv:

    y = scale * (conv(x, W) - mean) / sqrt(var + eps) + bias
      = conv(x, W * s) + (bias - mean * s),   s = scale / sqrt(var + eps)

``InferenceModelB2`` is the same U-Net with per-conv bias instead of BN
(conv -> bias -> ReLU, which XLA fuses into the conv epilogue), and
``fold_batchnorm`` converts standard {'params', 'batch_stats'} variables into
its parameter tree. The decoder bilinear runs NHWC-natively (no transposes).

Numerical equivalence with ModelB2(train=False) is exact up to float
associativity (tested to ~1e-5 in tests/test_fused.py).
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sifsr_tpu.models.unet import Conv3x3
from sifsr_tpu.ops.resize import resize_matrix

__all__ = ["InferenceModelB2", "fold_batchnorm", "upsample_bilinear_x2_nhwc"]


def upsample_bilinear_x2_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """align_corners bilinear x2 on NHWC without layout transposes.

    Stays in the einsum form deliberately: round-2 profiling showed a
    roll/fma stencil variant (since deleted from ops/resize) fragments into
    unfused materialised passes under XLA TPU and loses to the dot emitter
    at these sizes; the Pallas phase-separated upsample replaces this on the
    serving fast path instead."""
    n, h, w, c = x.shape
    mat_h = jnp.asarray(resize_matrix(h, 2 * h, "linear_ac"), dtype=x.dtype)
    mat_w = jnp.asarray(resize_matrix(w, 2 * w, "linear_ac"), dtype=x.dtype)
    x = jnp.einsum("oh,nhwc->nowc", mat_h, x)
    return jnp.einsum("pw,nowc->nopc", mat_w, x)


class _FusedConv(nn.Module):
    """3x3 replicate-pad conv -> bias [-> ReLU].

    pad handling per ``models.unet.Conv3x3`` (pad_impl='fused' skips the
    materialised (H+2)(W+2) pad copies — the same HBM-traffic tax profiled
    at ~44% of the training step also hits the forward-only serving path).
    dtype=None: the serving step pre-casts the folded variable tree, so the
    conv runs in whatever dtype the variables/activations arrive in."""

    features: int
    padding_mode: str = "replicate"
    relu: bool = True
    precision: lax.Precision = lax.Precision.DEFAULT
    pad_impl: str = "explicit"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv3x3(
            self.features, self.padding_mode, True, self.precision,
            dtype=None, pad_impl=self.pad_impl, name="conv",
        )(x)
        return nn.relu(x) if self.relu else x


class _FusedDouble(nn.Module):
    features: int
    mid_features: int | None = None
    padding_mode: str = "replicate"
    precision: lax.Precision = lax.Precision.DEFAULT
    pad_impl: str = "explicit"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mid = self.mid_features or self.features
        x = _FusedConv(mid, self.padding_mode, True, self.precision, self.pad_impl, name="conv1")(x)
        return _FusedConv(self.features, self.padding_mode, True, self.precision, self.pad_impl, name="conv2")(x)


class _FusedDown(nn.Module):
    in_features: int
    out_features: int
    padding_mode: str = "replicate"
    precision: lax.Precision = lax.Precision.DEFAULT
    pad_impl: str = "explicit"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        x = jnp.mean(x.reshape(n, h // 2, 2, w // 2, 2, c), axis=(2, 4))
        x = x + _FusedDouble(self.in_features, None, self.padding_mode, self.precision, self.pad_impl, name="res")(x)
        return _FusedConv(self.out_features, self.padding_mode, True, self.precision, self.pad_impl, name="lastconv")(x)


class _FusedUp(nn.Module):
    in_features: int
    out_features: int
    padding_mode: str = "replicate"
    precision: lax.Precision = lax.Precision.DEFAULT
    pad_impl: str = "explicit"

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        x = upsample_bilinear_x2_nhwc(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return _FusedDouble(
            self.out_features, self.in_features // 2, self.padding_mode, self.precision,
            self.pad_impl, name="convbloc",
        )(x)


class InferenceModelB2(nn.Module):
    """BN-folded ModelB2 for serving. Same topology as models.unet.ModelB2."""

    in_channels: int = 2
    downchannels: Sequence[int] = (16, 32, 64, 128)
    padding_mode: str = "replicate"
    precision: lax.Precision = lax.Precision.DEFAULT
    pad_impl: str = "explicit"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = list(self.downchannels)
        pm, pr, pi = self.padding_mode, self.precision, self.pad_impl

        s0 = _FusedDouble(d[0], None, pm, pr, pi, name="inbloc")(x)
        s1 = _FusedDown(d[0], d[1], pm, pr, pi, name="db1")(s0)
        s2 = _FusedDown(d[1], d[2], pm, pr, pi, name="db2")(s1)
        x = _FusedDown(d[2], d[3] // 2, pm, pr, pi, name="db3")(s2)

        x = _FusedUp(d[3], d[2] // 2, pm, pr, pi, name="ub1")(x, s2)
        x = _FusedUp(d[2], d[1] // 2, pm, pr, pi, name="ub2")(x, s1)
        x = _FusedUp(d[1], d[0], pm, pr, pi, name="ub3")(x, s0)

        return _FusedConv(1, pm, False, pr, pi, name="outlay")(x)


def _fold_pair(conv: dict, bn: dict) -> dict:
    """Fold one (conv kernel HWIO, BN params+stats) pair into kernel+bias."""
    s = bn["scale"] / jnp.sqrt(bn["var"] + 1e-5)
    kernel = conv["kernel"] * s[None, None, None, :]
    bias = bn["bias"] - bn["mean"] * s
    return {"kernel": kernel, "bias": bias}


def fold_batchnorm(variables: dict) -> dict:
    """{'params', 'batch_stats'} of ModelB2 -> {'params'} of InferenceModelB2.

    Pure-jnp, so it can run inside a jitted serving step (a few kFLOPs —
    XLA constant-folds it when the variables are literals)."""
    params = variables["params"]
    stats = variables["batch_stats"]

    def fold_double(p, s):
        return {
            "conv1": {"conv": _fold_pair(p["conv1"], {**p["bn1"], **s["bn1"]})},
            "conv2": {"conv": _fold_pair(p["conv2"], {**p["bn2"], **s["bn2"]})},
        }

    out: dict = {"inbloc": fold_double(params["inbloc"], stats["inbloc"])}
    for name in ("db1", "db2", "db3"):
        out[name] = {
            "res": fold_double(params[name]["res"], stats[name]["res"]),
            "lastconv": {
                "conv": _fold_pair(
                    params[name]["lastconv"], {**params[name]["lastbn"], **stats[name]["lastbn"]}
                )
            },
        }
    for name in ("ub1", "ub2", "ub3"):
        out[name] = {"convbloc": fold_double(params[name]["convbloc"], stats[name]["convbloc"])}
    out["outlay"] = {
        "conv": {
            "kernel": params["outlay"]["kernel"],
            "bias": params["outlay"]["bias"],
        }
    }
    return {"params": out}
