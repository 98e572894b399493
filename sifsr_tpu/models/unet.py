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

import functools
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


_DN = ("NHWC", "HWIO", "NHWC")


def _replicate_conv_fused(x: jnp.ndarray, w: jnp.ndarray, precision) -> jnp.ndarray:
    """3x3 replicate-pad conv WITHOUT materialising the padded input.

    The explicit-pad path writes + reads a full (N, H+2, W+2, C) copy of every
    conv input, forward and backward — profiled at ~44% of the bf16 train-step
    wall (tools/profile_train.py, round 4). Here the interior comes from a
    zero-SAME conv (padding handled inside the conv window config — no copy)
    and the border ring, where zero- and replicate-padding differ, is patched
    with O(H+W) corrections: the halo taps a zero pad dropped are re-added
    from the clamped edge rows/columns, minus the four corner taps counted by
    both their row and their column correction.

    Interior pixels see all nine taps inside the conv exactly as the explicit
    path does (bit-identical); border pixels accumulate the missing taps in a
    second addition, so they differ from the single-dot explicit result only
    by float summation order (~1 ulp).
    """
    out = lax.conv_general_dilated(
        x, w, (1, 1), padding=((1, 1), (1, 1)), dimension_numbers=_DN,
        precision=precision)

    def _shift(a, axis, d):
        # shift by d along axis with replicate clamp at the open end
        if d == -1:
            first = lax.slice_in_dim(a, 0, 1, axis=axis)
            body = lax.slice_in_dim(a, 0, a.shape[axis] - 1, axis=axis)
            return jnp.concatenate([first, body], axis=axis)
        last = lax.slice_in_dim(a, a.shape[axis] - 1, a.shape[axis], axis=axis)
        body = lax.slice_in_dim(a, 1, a.shape[axis], axis=axis)
        return jnp.concatenate([body, last], axis=axis)

    def _corr(edge, wvec, axis):
        # edge: the clamped halo line (N,1,W,C) or (N,H,1,C); wvec: (3, Cin, K)
        # returns the sum of the three dropped-tap contributions along `axis`
        mm = functools.partial(jnp.einsum, "nhwc,ck->nhwk", precision=precision)
        return (mm(_shift(edge, axis, -1), wvec[0]) + mm(edge, wvec[1])
                + mm(_shift(edge, axis, +1), wvec[2]))

    ct = _corr(x[:, :1], w[0], axis=2)        # taps from the replicated row -1
    cb = _corr(x[:, -1:], w[2], axis=2)       # taps from the replicated row H
    cl = _corr(x[:, :, :1], w[:, 0], axis=1)  # taps from the replicated col -1
    cr = _corr(x[:, :, -1:], w[:, 2], axis=1)
    out = out.at[:, :1].add(ct).at[:, -1:].add(cb)
    out = out.at[:, :, :1].add(cl).at[:, :, -1:].add(cr)
    # each corner's diagonal halo tap (e.g. w[0,0]·x[0,0] at out[0,0]) was
    # added by both its row and its column correction — take one back out
    mmc = functools.partial(jnp.einsum, "nc,ck->nk", precision=precision)
    out = out.at[:, 0, 0].add(-mmc(x[:, 0, 0], w[0, 0]))
    out = out.at[:, 0, -1].add(-mmc(x[:, 0, -1], w[0, 2]))
    out = out.at[:, -1, 0].add(-mmc(x[:, -1, 0], w[2, 0]))
    out = out.at[:, -1, -1].add(-mmc(x[:, -1, -1], w[2, 2]))
    return out


class Conv3x3(nn.Module):
    """3x3 stride-1 conv with replicate/reflect/zeros padding.

    Drop-in for the previous ``nn.Conv(kernel_size=(3,3), padding='VALID')``
    on an explicitly padded input: same param names ("kernel"/"bias"), same
    shapes, same initialisers and the same RNG fold path, so existing
    checkpoints and seeded inits are unchanged.

    pad_impl:
      'explicit' (default) — materialised edge-pad + VALID conv; bit-exact
        with the reference semantics everywhere.
      'fused' — replicate only: zero-SAME conv + border-ring correction
        (``_replicate_conv_fused``); skips the (H+2)(W+2) pad copies that
        dominate training HBM traffic. Interior bit-identical, border differs
        by summation order (~1 ulp).
    """

    features: int
    padding_mode: str = "replicate"
    use_bias: bool = False
    precision: lax.Precision = lax.Precision.HIGHEST
    # computation dtype; None = inherit the input/param dtypes as given
    # (the BN-folded serving model pre-casts its whole variable tree)
    dtype: jnp.dtype | None = jnp.float32
    pad_impl: str = "explicit"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            w = kernel.astype(self.dtype)
        else:
            w = kernel.astype(x.dtype)
        if self.pad_impl == "fused" and self.padding_mode == "replicate":
            y = _replicate_conv_fused(x, w, self.precision)
        else:
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                         mode=_PAD_MODES[self.padding_mode])
            y = lax.conv_general_dilated(
                xp, w, (1, 1), padding="VALID", dimension_numbers=_DN,
                precision=self.precision)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


def _conv3x3(x: jnp.ndarray, features: int, padding_mode: str, use_bias: bool, name: str, precision=lax.Precision.HIGHEST, dtype=jnp.float32, pad_impl: str = "explicit") -> jnp.ndarray:
    """3x3 stride-1 conv with pad handling per ``Conv3x3``.

    precision: HIGHEST (f32 accumulation) for training/parity paths; pass
    DEFAULT for bf16 serving where single-pass MXU issue is ~3x faster.
    dtype: computation dtype (params stay f32 — mixed-precision training
    keeps f32 master weights; flax casts per-op).
    """
    return Conv3x3(features, padding_mode, use_bias, precision, dtype,
                   pad_impl, name=name)(x)


class DoubleConv(nn.Module):
    """(Conv3x3 no-bias -> BN -> ReLU)² (reference model.py:85-159)."""

    features: int
    mid_features: int | None = None
    padding_mode: str = "replicate"
    precision: lax.Precision = lax.Precision.HIGHEST
    dtype: jnp.dtype = jnp.float32
    pad_impl: str = "explicit"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        mid = self.mid_features or self.features
        x = _conv3x3(x, mid, self.padding_mode, False, "conv1", self.precision, self.dtype, self.pad_impl)
        x = nn.relu(TorchBatchNorm(mid, name="bn1", dtype=self.dtype)(x, train))
        x = _conv3x3(x, self.features, self.padding_mode, False, "conv2", self.precision, self.dtype, self.pad_impl)
        return nn.relu(TorchBatchNorm(self.features, name="bn2", dtype=self.dtype)(x, train))


class DownBlockPool(nn.Module):
    """AvgPool2 -> x + DoubleConv(x) -> Conv/BN/ReLU (reference model.py:458-531)."""

    in_features: int
    out_features: int
    padding_mode: str = "replicate"
    precision: lax.Precision = lax.Precision.HIGHEST
    dtype: jnp.dtype = jnp.float32
    pad_impl: str = "explicit"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        # NHWC average pool over 2x2 windows.
        n, h, w, c = x.shape
        x = jnp.mean(x.reshape(n, h // 2, 2, w // 2, 2, c), axis=(2, 4))
        x = x + DoubleConv(
            self.in_features, padding_mode=self.padding_mode,
            precision=self.precision, dtype=self.dtype, name="res",
            pad_impl=self.pad_impl,
        )(x, train)
        x = _conv3x3(x, self.out_features, self.padding_mode, False, "lastconv", self.precision, self.dtype, self.pad_impl)
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
    pad_impl: str = "explicit"

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
            pad_impl=self.pad_impl,
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
    # 'fused' skips the materialised replicate pads (Conv3x3 docstring) —
    # measured 1.7x bf16 train-step throughput; 'explicit' is the bit-exact
    # reference-parity default
    pad_impl: str = "explicit"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = list(self.downchannels)
        pm = self.padding_mode
        pr = self.precision
        dt = self.dtype
        pi = self.pad_impl
        up = 2 if self.bilinear else 1  # reference's upfactor (model.py:591)
        bl = self.bilinear

        x = x.astype(dt)
        s0 = DoubleConv(d[0], padding_mode=pm, precision=pr, dtype=dt, pad_impl=pi, name="inbloc")(x, train)
        s1 = DownBlockPool(d[0], d[1], pm, pr, dt, pi, name="db1")(s0, train)
        s2 = DownBlockPool(d[1], d[2], pm, pr, dt, pi, name="db2")(s1, train)
        x = DownBlockPool(d[2], d[3] // up, pm, pr, dt, pi, name="db3")(s2, train)

        x = UpBlock(d[3], d[2] // up, pm, pr, bl, dt, pi, name="ub1")(x, s2, train)
        x = UpBlock(d[2], d[1] // up, pm, pr, bl, dt, pi, name="ub2")(x, s1, train)
        x = UpBlock(d[1], d[0], pm, pr, bl, dt, pi, name="ub3")(x, s0, train)

        return _conv3x3(x, 1, pm, True, "outlay", pr, dt, pi).astype(jnp.float32)
