"""ModelB_2 — the shared-weights SR U-Net, rebuilt TPU-first in flax linen.

Functional description (matches reference model.py:533-645 exactly):

    input  (N, 256, 256, 2)  = concat(bicubic-up LST, NDVI), NHWC
    inbloc DoubleConv(2->16)                               @256²   -> skip0
    db1    AvgPool2 -> Residual(DoubleConv 16->16) -> Conv/BN/ReLU 16->32  @128² -> skip1
    db2    ... 32->64                                      @64²    -> skip2
    db3    ... 64->64 (=128//2, bilinear halves the floor) @32²
    ub1    bilinear x2 (align_corners) -> cat(x, skip2) -> DoubleConv(128->32, mid 64)
    ub2    -> cat(x, skip1) -> DoubleConv(64->16, mid 32)
    ub3    -> cat(x, skip0) -> DoubleConv(32->16, mid 16)
    outlay Conv3x3(16->1, bias)                            @256²

TPU-first choices (vs the reference's NCHW torch graph):
- NHWC layout throughout — XLA's native conv layout on TPU; channels ride the
  lane dimension.
- 'replicate' padding is an explicit edge-pad followed by a VALID conv so XLA
  sees a static-shape conv it can tile onto the MXU.
- the decoder upsample is the precomputed align_corners bilinear matrix from
  ops.resize (two small matmuls) rather than a gather.
- BatchNorm is a custom module with *torch-exact* semantics (biased variance
  for normalisation, unbiased for the running update, momentum 0.1), so both
  eval parity against released checkpoints and train-step parity hold. Under
  pjit data parallelism the batch statistics are computed over the global
  logical batch automatically (XLA inserts the cross-chip reductions).

The unused pieces of the reference (Serf activation, ResBridgeBlock, DownBlock
with strided conv, n_bridge_blocks) are intentionally not rebuilt —
see SURVEY.md §2 "dead/vestigial code".
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from sifsr_tpu.ops.resize import upsample_bilinear_x2

__all__ = ["ModelB2", "TorchBatchNorm"]

_PAD_MODES = {"replicate": "edge", "reflect": "reflect", "zeros": "constant"}


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with torch-exact train/eval semantics.

    train: normalise by biased batch variance; update running stats with
           momentum 0.1 and *unbiased* variance (torch BatchNorm2d default).
    eval:  normalise by running stats.
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32  # compute dtype of the output; statistics
    # and running stats always accumulate in f32 (mixed-precision safety)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        if train:
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=reduce_axes)
            var = jnp.mean(jnp.square(x), axis=reduce_axes) - jnp.square(mean)
            n = 1
            for ax in reduce_axes:
                n *= x.shape[ax]
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = lax.rsqrt(var + self.eps) * scale
        return (x * inv + (bias - mean * inv)).astype(self.dtype)


def _conv3x3(x: jnp.ndarray, features: int, padding_mode: str, use_bias: bool, name: str, precision=lax.Precision.HIGHEST, dtype=jnp.float32) -> jnp.ndarray:
    """3x3 stride-1 conv with explicit pad (replicate/reflect/zeros) + VALID.

    precision: HIGHEST (f32 accumulation) for training/parity paths; pass
    DEFAULT for bf16 serving where single-pass MXU issue is ~3x faster.
    dtype: computation dtype (params stay f32 — mixed-precision training
    keeps f32 master weights; flax casts per-op).
    """
    pad_mode = _PAD_MODES[padding_mode]
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=pad_mode)
    return nn.Conv(
        features=features,
        kernel_size=(3, 3),
        padding="VALID",
        use_bias=use_bias,
        name=name,
        precision=precision,
        dtype=dtype,
    )(x)


class DoubleConv(nn.Module):
    """(Conv3x3 no-bias -> BN -> ReLU)² (reference model.py:85-159)."""

    features: int
    mid_features: int | None = None
    padding_mode: str = "replicate"
    precision: lax.Precision = lax.Precision.HIGHEST
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        mid = self.mid_features or self.features
        x = _conv3x3(x, mid, self.padding_mode, False, "conv1", self.precision, self.dtype)
        x = nn.relu(TorchBatchNorm(mid, name="bn1", dtype=self.dtype)(x, train))
        x = _conv3x3(x, self.features, self.padding_mode, False, "conv2", self.precision, self.dtype)
        return nn.relu(TorchBatchNorm(self.features, name="bn2", dtype=self.dtype)(x, train))


class DownBlockPool(nn.Module):
    """AvgPool2 -> x + DoubleConv(x) -> Conv/BN/ReLU (reference model.py:458-531)."""

    in_features: int
    out_features: int
    padding_mode: str = "replicate"
    precision: lax.Precision = lax.Precision.HIGHEST
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        # NHWC average pool over 2x2 windows.
        n, h, w, c = x.shape
        x = jnp.mean(x.reshape(n, h // 2, 2, w // 2, 2, c), axis=(2, 4))
        x = x + DoubleConv(
            self.in_features, padding_mode=self.padding_mode,
            precision=self.precision, dtype=self.dtype, name="res",
        )(x, train)
        x = _conv3x3(x, self.out_features, self.padding_mode, False, "lastconv", self.precision, self.dtype)
        return nn.relu(TorchBatchNorm(self.out_features, name="lastbn", dtype=self.dtype)(x, train))


class UpBlock(nn.Module):
    """x2 upsample -> cat(x, skip) -> DoubleConv (reference model.py:161-248).

    bilinear=True (every published model): align_corners bilinear + DoubleConv
    with mid = in//2. bilinear=False: ConvTranspose(k=2, s=2) halving the
    channels, then DoubleConv with mid = out (reference model.py:210-213).
    """

    in_features: int
    out_features: int
    padding_mode: str = "replicate"
    precision: lax.Precision = lax.Precision.HIGHEST
    bilinear: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.bilinear:
            x = jnp.moveaxis(upsample_bilinear_x2(jnp.moveaxis(x, -1, 1)), 1, -1)
            mid = self.in_features // 2
        else:
            x = nn.ConvTranspose(
                self.in_features // 2, (2, 2), strides=(2, 2), padding="VALID",
                precision=self.precision, dtype=self.dtype, name="up",
            )(x)
            mid = None
        # Power-of-two feature maps always line up; the reference's pad-to-match
        # (model.py:238-245) is a no-op for every published configuration.
        x = jnp.concatenate([x.astype(self.dtype), skip], axis=-1)
        return DoubleConv(
            self.out_features,
            mid_features=mid,
            padding_mode=self.padding_mode,
            precision=self.precision,
            dtype=self.dtype,
            name="convbloc",
        )(x, train)


class ModelB2(nn.Module):
    """The SIF-CNN-SR network. Input NHWC (N, H, W, 2), output (N, H, W, 1).

    Constructor args mirror the reference params JSON (paramsB.json
    modelB_parameters). ``bilinear`` selects the decoder upsample exactly like
    the reference's ``upfactor`` arithmetic (model.py:591-605): True (every
    published model) = align_corners bilinear with halved encoder floor;
    False = ConvTranspose(k=2, s=2) decoder.
    """

    in_channels: int = 2
    downchannels: Sequence[int] = (16, 32, 64, 128)
    padding_mode: str = "replicate"
    # HIGHEST = f32 accumulation for parity/training; DEFAULT = single-pass
    # bf16 MXU issue for serving (~3x faster, ~0.01 K output delta).
    precision: lax.Precision = lax.Precision.HIGHEST
    bilinear: bool = True
    # compute dtype: bfloat16 = mixed-precision training/serving (params and
    # BN statistics stay f32; the output is cast back to f32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = list(self.downchannels)
        pm = self.padding_mode
        pr = self.precision
        dt = self.dtype
        up = 2 if self.bilinear else 1  # reference's upfactor (model.py:591)
        bl = self.bilinear

        x = x.astype(dt)
        s0 = DoubleConv(d[0], padding_mode=pm, precision=pr, dtype=dt, name="inbloc")(x, train)
        s1 = DownBlockPool(d[0], d[1], pm, pr, dt, name="db1")(s0, train)
        s2 = DownBlockPool(d[1], d[2], pm, pr, dt, name="db2")(s1, train)
        x = DownBlockPool(d[2], d[3] // up, pm, pr, dt, name="db3")(s2, train)

        x = UpBlock(d[3], d[2] // up, pm, pr, bl, dt, name="ub1")(x, s2, train)
        x = UpBlock(d[2], d[1] // up, pm, pr, bl, dt, name="ub2")(x, s1, train)
        x = UpBlock(d[1], d[0], pm, pr, bl, dt, name="ub3")(x, s0, train)

        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=_PAD_MODES[pm])
        return nn.Conv(1, (3, 3), padding="VALID", use_bias=True, name="outlay",
                       precision=pr, dtype=dt)(x).astype(jnp.float32)
