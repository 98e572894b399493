"""Space-to-depth packed serving forward — the bench-critical fast path.

Profiling the BN-folded serving step on v5e showed ~40% of device time in
bias+ReLU elementwise fusions: NHWC tensors with C=16 pad the minor (lane)
dimension 8x on TPU (bf16 tile (16,128)), so every elementwise pass over a
256²x16 feature map moves 8x the useful bytes. The fix is an *exact* network
transform: operate the 256²-resolution layers (inbloc, ub3, outlay) on a
2x2-space-to-depth packed layout (N, 128, 128, 4C) where the packed channel
index is (q*2+r)*C + c for pixel phase (q, r):

- a 3x3 stride-1 conv C->D becomes a 3x3 conv 4C->4D with weights
      Wp[p+1, s+1, (q,r,c), (do,eo,k)] = W[2p+q-do+1, 2s+r-eo+1, c, k]
  (zero where the tap index leaves [0,3)); the dense packed compute equals
  the lane-padded compute XLA was already doing, while elementwise traffic
  drops ~4x (min channel dim becomes 64);
- 'replicate' padding is NOT plain edge-padding in packed space: the pad row
  must replicate the *outermost original* row into both phase slots
  (P[-1,(q,r,c)] = P[0,(0,r,c)], P[H,(q,r,c)] = P[H-1,(1,r,c)]) — built
  explicitly below;
- the encoder's first AvgPool2 is a free channel-mean over (q, r);
- the decoder's align_corners bilinear x2 (and the input's cv2-exact bicubic
  x4) emit packed outputs directly through per-phase resampling matrices
  A_do[i, h] = A[2i+do, h].

Equivalence with the BN-folded reference forward is exact up to float
associativity (tested in tests/test_packed.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sifsr_tpu.models.fused import fold_batchnorm
from sifsr_tpu.ops.resize import resize_matrix

__all__ = ["pack_conv_weights", "pack_serving_params", "packed_forward", "make_packed_sr_step"]


def pack_conv_weights(w: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """HWIO (3,3,C,K) + bias (K,) -> packed (3,3,4C,4K) + bias (4K,)."""
    w = np.asarray(w)
    b = np.asarray(b)
    c_in, c_out = w.shape[2], w.shape[3]
    wp = np.zeros((3, 3, 4 * c_in, 4 * c_out), np.float32)
    for p in (-1, 0, 1):
        for s in (-1, 0, 1):
            for q in (0, 1):
                for r in (0, 1):
                    for do in (0, 1):
                        for eo in (0, 1):
                            dy = 2 * p + q - do + 1
                            dx = 2 * s + r - eo + 1
                            if 0 <= dy < 3 and 0 <= dx < 3:
                                wp[
                                    p + 1,
                                    s + 1,
                                    (q * 2 + r) * c_in : (q * 2 + r + 1) * c_in,
                                    (do * 2 + eo) * c_out : (do * 2 + eo + 1) * c_out,
                                ] = w[dy, dx]
    bp = np.concatenate([b] * 4).astype(np.float32)
    return wp, bp


@functools.lru_cache(maxsize=None)
def _pad_perms(c: int) -> tuple:
    """Channel permutations implementing the packed replicate pad: the pad
    row/col takes the border packed pixel with its phase slot replaced by the
    outermost original row/col (q->0 at top, q->1 at bottom, r likewise)."""
    j = np.arange(4 * c)
    q, r, ch = j // (2 * c), (j // c) % 2, j % c
    return (
        tuple((r * c + ch).tolist()),            # top: (0, r, c)
        tuple(((2 + r) * c + ch).tolist()),      # bottom: (1, r, c)
        tuple((q * 2 * c + ch).tolist()),        # left: (q, 0, c)
        tuple(((q * 2 + 1) * c + ch).tolist()),  # right: (q, 1, c)
    )


def _replicate_pad_packed(x: jnp.ndarray, c: int) -> jnp.ndarray:
    """Packed-space 'replicate' pad by one packed pixel on each side.

    Implemented as border-slice gathers with channel permutations (cheap —
    only 1-pixel-wide strips move) instead of 6-D reshape/concat of the whole
    tensor (which XLA materialises as full copies)."""
    perm_top, perm_bottom, perm_left, perm_right = (
        jnp.asarray(p) for p in _pad_perms(c)
    )
    top = x[:, :1, :, perm_top]
    bottom = x[:, -1:, :, perm_bottom]
    x = jnp.concatenate([top, x, bottom], axis=1)
    left = x[:, :, :1, perm_left]
    right = x[:, :, -1:, perm_right]
    return jnp.concatenate([left, x, right], axis=2)


def _packed_conv(x: jnp.ndarray, wp: jnp.ndarray, bp: jnp.ndarray, c_in: int, relu: bool = True):
    x = _replicate_pad_packed(x, c_in)
    y = lax.conv_general_dilated(
        x, wp, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.DEFAULT,
    )
    y = y + bp
    return jnp.maximum(y, 0) if relu else y


@functools.lru_cache(maxsize=None)
def _phase_matrices(in_size: int, out_size: int, kind: str) -> np.ndarray:
    """(2, out_size//2, in_size) per-phase rows of a resampling matrix."""
    a = resize_matrix(in_size, out_size, kind)
    return np.stack([a[0::2], a[1::2]]).astype(np.float32)


def _packed_resize(x: jnp.ndarray, phases: jnp.ndarray) -> jnp.ndarray:
    """(N, h, w, C) -> packed (N, H/2, W/2, 4C) of the resized image."""
    n, h, w, c = x.shape
    phases = phases.astype(x.dtype)
    t = jnp.einsum("dih,nhwc->ndiwc", phases, x, precision=lax.Precision.HIGHEST)
    y = jnp.einsum("ejw,ndiwc->nijdec", phases, t, precision=lax.Precision.HIGHEST)
    n_, oi, oj = y.shape[0], y.shape[1], y.shape[2]
    return y.reshape(n_, oi, oj, 4 * c).astype(x.dtype)


def _space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), channel order (q, r, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def _depth_to_space(x: jnp.ndarray, c: int) -> jnp.ndarray:
    n, h, w, _ = x.shape
    x = x.reshape(n, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, 2 * h, 2 * w, c)


def _packed_concat(a: jnp.ndarray, ca: int, b: jnp.ndarray, cb: int) -> jnp.ndarray:
    """Concat along the original channel dim inside each (q, r) slot."""
    n, h, w, _ = a.shape
    a5 = a.reshape(n, h, w, 4, ca)
    b5 = b.reshape(n, h, w, 4, cb)
    return jnp.concatenate([a5, b5], axis=-1).reshape(n, h, w, 4 * (ca + cb))


def pack_serving_params(variables: dict, dtype=jnp.float32) -> dict:
    """ModelB2 {'params','batch_stats'} -> BN-folded params with the level-0
    convs (inbloc, ub3.convbloc, outlay) packed for space-to-depth serving.
    Returns device-resident jnp arrays (a numpy tree would be re-uploaded on
    every serving call)."""
    folded = jax.device_get(fold_batchnorm(variables))["params"]
    out = {"mid": folded}  # db1..db3, ub1, ub2 consumed as-is

    def grab(tree):
        return np.asarray(tree["kernel"]), np.asarray(tree["bias"])

    packed = {}
    packed["in_conv1"] = pack_conv_weights(*grab(folded["inbloc"]["conv1"]["conv"]))
    packed["in_conv2"] = pack_conv_weights(*grab(folded["inbloc"]["conv2"]["conv"]))
    packed["ub3_conv1"] = pack_conv_weights(*grab(folded["ub3"]["convbloc"]["conv1"]["conv"]))
    packed["ub3_conv2"] = pack_conv_weights(*grab(folded["ub3"]["convbloc"]["conv2"]["conv"]))
    packed["outlay"] = pack_conv_weights(*grab(folded["outlay"]["conv"]))
    out["packed"] = packed
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), out)


def _mid_conv(x, tree, relu=True):
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = lax.conv_general_dilated(
        x, jnp.asarray(tree["kernel"]), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=lax.Precision.DEFAULT,
    ) + jnp.asarray(tree["bias"])
    return jnp.maximum(y, 0) if relu else y


def _mid_double(x, tree):
    x = _mid_conv(x, tree["conv1"]["conv"])
    return _mid_conv(x, tree["conv2"]["conv"])


def _mid_down_body(x, tree):
    """Residual DoubleConv + lastconv (the DownBlock minus its AvgPool)."""
    x = x + _mid_double(x, tree["res"])
    return _mid_conv(x, tree["lastconv"]["conv"])


def _mid_down(x, tree):
    n, h, w, c = x.shape
    x = jnp.mean(x.reshape(n, h // 2, 2, w // 2, 2, c), axis=(2, 4))
    return _mid_down_body(x, tree)


def _bilinear_x2_nhwc(x):
    from sifsr_tpu.models.fused import upsample_bilinear_x2_nhwc

    return upsample_bilinear_x2_nhwc(x)


def packed_forward(params: dict, lst_up_packed: jnp.ndarray, ndvi_packed: jnp.ndarray,
                   c0: int = 16) -> jnp.ndarray:
    """Packed serving forward. Inputs: packed (N,128,128,4) LST-up and NDVI
    planes (phase-major, c=1 each); output packed SR (N,128,128,4)."""
    mid = params["mid"]
    pk = params["packed"]

    x = _packed_concat(lst_up_packed, 1, ndvi_packed, 1)          # (N,h,w,8)
    x = _packed_conv(x, *map(jnp.asarray, pk["in_conv1"]), c_in=2)
    s0p = _packed_conv(x, *map(jnp.asarray, pk["in_conv2"]), c_in=c0)  # (N,h,w,4*16)

    n, h, w, _ = s0p.shape
    # db1's AvgPool2 of the 2x-resolution s0 is exactly the channel-mean over
    # the (q, r) phases of the packed map — the pool comes for free
    s1_in = s0p.reshape(n, h, w, 4, c0).mean(axis=3)              # (N,h,w,16) @128²
    s1 = _mid_down_body(s1_in, mid["db1"])                        # (N,h,w,32)
    s2 = _mid_down(s1, mid["db2"])                                # (N,h/2,w/2,64)
    x = _mid_down(s2, mid["db3"])                                 # (N,h/4,w/4,64)

    x = jnp.concatenate([_bilinear_x2_nhwc(x), s2], axis=-1)
    x = _mid_double(x, mid["ub1"]["convbloc"])                    # 32 @ h/4
    x = jnp.concatenate([_bilinear_x2_nhwc(x), s1], axis=-1)
    x = _mid_double(x, mid["ub2"]["convbloc"])                    # 16 @ h/2

    # ub3: packed bilinear x2 of the 16-ch map, packed concat with s0p
    phases = jnp.asarray(_phase_matrices(x.shape[1], 2 * x.shape[1], "linear_ac"))
    up_p = _packed_resize(x, phases)                              # (N,h,w,64)
    x = _packed_concat(up_p, c0, s0p, c0)                         # (N,h,w,128)
    x = _packed_conv(x, *map(jnp.asarray, pk["ub3_conv1"]), c_in=2 * c0)
    x = _packed_conv(x, *map(jnp.asarray, pk["ub3_conv2"]), c_in=c0)
    return _packed_conv(x, *map(jnp.asarray, pk["outlay"]), c_in=c0, relu=False)  # (N,h,w,4)


def make_packed_sr_step(stats, compute_dtype=jnp.bfloat16):
    """Packed-serving twin of inference.make_sr_step:
    (packed_params, lst (N,64,64) K, ndvi (N,256,256)) -> (N,256,256) K."""

    @jax.jit
    def sr_step(params, lst_blocks, ndvi_blocks):
        lst_n = (lst_blocks - stats.mean_lst) / stats.std_lst
        ndvi_n = (ndvi_blocks - stats.mean_ndvi) / stats.std_ndvi
        h = lst_blocks.shape[1]
        phases = jnp.asarray(_phase_matrices(h, 4 * h, "cubic"))
        lst_up_p = _packed_resize(lst_n[..., None], phases).astype(compute_dtype)
        ndvi_p = _space_to_depth(ndvi_n[..., None]).astype(compute_dtype)
        params = jax.tree.map(lambda a: jnp.asarray(a, compute_dtype), params)
        sr_p = packed_forward(params, lst_up_p, ndvi_p)
        sr = _depth_to_space(sr_p.astype(jnp.float32), 1)[..., 0]
        return sr * stats.std_lst + stats.mean_lst

    return sr_step
