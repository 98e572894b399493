"""Phase-separated integer-factor upsampling as a Pallas TPU kernel.

Why: the serving graph needs three exact resizes (torch-parity cubic x4 for
the LST input, align-corners bilinear x2 for the U-Net decoder upsamples and
for the packed ub3 input — reference model.py:228-259, utils.py:163-180).
Round-2 profiling showed every XLA formulation losing: the einsum form hits
~100x-off-roofline dot emitters plus layout copies at the pallas custom-call
boundaries, a jnp.take form lowers to catastrophic gathers, and a roll/fma
stencil form fragments into unfused materialised passes (~9 ms/iter of the
serving step between them at batch 256).

The kernel form: per image, per row-phase d, the row pass is
    r_d = sum_delta C[d, delta] (*) roll_rows(x, -delta)
with per-row varying coefficients (align_corners grids are non-uniform, so
this is NOT a convolution), then each column-phase e is
    y_de = sum_delta D[e, delta] (*) roll_lanes(r_d, -delta * C)
— pure VPU fma work on a VMEM-resident (H, W*C) value; out-of-range taps
carry exactly-zero coefficients so the roll wrap never contaminates.
Numerically identical to the HIGHEST-precision resize_matrix matmul (same
products, same ascending-tap summation order; ops/resize.resize_taps).

Phase-separated output (N, f, f, H, W, C) sidesteps the row/column
interleave (a lane<->sublane crossing Mosaic cannot express): XLA does the
final phase transpose, which is a single cheap relayout fusion —
phases_to_nhwc / phases_to_packed below.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sifsr_tpu.ops.resize import _upsample_stencil

__all__ = ["upsample_phases", "phases_to_nhwc", "phases_to_packed_x2",
           "phases_to_packed_x4"]


@functools.lru_cache(maxsize=None)
def _coeff_arrays(in_size: int, factor: int, kind: str, c: int, wc: bool):
    """(deltas tuple, coeffs (factor, n_deltas, in_size [*c])) from the
    stencil decomposition; wc=True expands each per-w coefficient across the
    c fastest-varying lanes (for the lane-roll column pass)."""
    st = _upsample_stencil(in_size, factor, kind)
    deltas = tuple(sorted({d for (_, d) in st}))
    out = np.zeros((factor, len(deltas), in_size), np.float32)
    for (ph, d), coef in st.items():
        out[ph, deltas.index(d)] = coef
    if wc:
        out = np.repeat(out, c, axis=2)
    return deltas, out


def _roll_rows(v, shift):
    return pltpu.roll(v, shift % v.shape[0], axis=0) if shift % v.shape[0] else v


def _roll_lanes(v, shift):
    return pltpu.roll(v, shift % v.shape[1], axis=1) if shift % v.shape[1] else v


def _phase_kernel(x_ref, rc_ref, cc_ref, sc_ref, out_ref, *, factor, deltas,
                  c, out_dtype):
    # f32 immediately: Mosaic's dynamic_rotate has no sub-32-bit support,
    # and bf16 inputs (the serving mid chain) would otherwise hit the rolls
    v = x_ref[0].astype(jnp.float32)               # (H, W*C)
    r = None
    for j, d in enumerate(deltas):
        term = rc_ref[0, j] * _roll_rows(v, -d)    # (H,1) x (H,WC)
        r = term if r is None else r + term
    for e in range(factor):
        y = None
        for j, d in enumerate(deltas):
            term = cc_ref[e, j].reshape(1, -1) * _roll_lanes(r, -d * c)
        # (1,WC) x (H,WC)
            y = term if y is None else y + term
        if out_dtype == jnp.int8:
            q = jnp.clip(jnp.round(y * sc_ref[0]), -127, 127)
            out_ref[0, 0, e] = q.astype(jnp.int8)
        else:
            out_ref[0, 0, e] = y.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("factor", "kind", "out_dtype", "interpret"),
)
def upsample_phases(x, factor: int, kind: str, out_dtype=jnp.float32,
                    scale=None, in_scale=None, interpret: bool = False):
    """(N, H, W, C) f32 -> (N, factor, factor, H, W, C) phase-separated
    upsample: result[n, d, e, k, l] == resized[n, factor*k+d, factor*l+e].

    out_dtype=jnp.int8 fuses quantisation by 1/scale into the epilogue.
    An int8 input with dequant scale `in_scale` is supported for free: the
    kernel casts to f32 anyway and the dequant multiply folds into the
    row-pass coefficients (linearity of the resize)."""
    n, h, w, c = x.shape
    wc = w * c
    rdeltas, rcoef = _coeff_arrays(h, factor, kind, c, False)
    cdeltas, ccoef = _coeff_arrays(w, factor, kind, c, True)
    deltas = tuple(sorted(set(rdeltas) | set(cdeltas)))

    def expand(coeff, have, size):
        full = np.zeros((factor, len(deltas), size), np.float32)
        for j, d in enumerate(have):
            full[:, deltas.index(d)] = coeff[:, j]
        return full

    rc = jnp.asarray(expand(rcoef, rdeltas, h)[..., None])   # (f, nd, h, 1)
    cc = jnp.asarray(expand(ccoef, cdeltas, wc))             # (f, nd, wc)
    if in_scale is not None:
        rc = rc * jnp.float32(in_scale)
    inv = jnp.full((1,), 0.0 if scale is None else 1.0, jnp.float32)
    if scale is not None:
        inv = (1.0 / jnp.asarray(scale, jnp.float32)).reshape(1)

    kern = functools.partial(_phase_kernel, factor=factor, deltas=deltas,
                             c=c, out_dtype=out_dtype)
    y = pl.pallas_call(
        kern,
        grid=(n, factor),
        in_specs=[
            pl.BlockSpec((1, h, wc), lambda i, d: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, len(deltas), h, 1), lambda i, d: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((factor, len(deltas), wc), lambda i, d: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, factor, h, wc),
                               lambda i, d: (i, d, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, factor, factor, h, wc), out_dtype),
        interpret=interpret,
    )(x.reshape(n, h, wc), rc, cc, inv)
    return y.reshape(n, factor, factor, h, w, c)


def phases_to_nhwc(y):
    """(N, f, f, H, W, C) -> (N, f*H, f*W, C): one XLA transpose fusion."""
    n, f, _, h, w, c = y.shape
    return y.transpose(0, 3, 1, 4, 2, 5).reshape(n, f * h, f * w, c)


def phases_to_packed_x2(y):
    """x2 phases -> the 2x2 space-to-depth packed form (N, H, W, 4C) with
    (q, r, c) channel order (models/packed._space_to_depth): for factor 2 the
    packed cell IS the phase pair, so no row interleave is needed at all."""
    n, f, _, h, w, c = y.shape
    assert f == 2, f
    return y.transpose(0, 3, 4, 1, 2, 5).reshape(n, h, w, 4 * c)


def phases_to_packed_x4(y):
    """x4 phases -> packed (N, 2H, 2W, 4C): fine row 4k+dd has packed row
    i = 2k + dd//2 and phase q = dd%2 (likewise columns)."""
    n, f, _, h, w, c = y.shape
    assert f == 4, f
    y = y.reshape(n, 2, 2, 2, 2, h, w, c)          # (n, a, q, b, r, k, l, c)
    y = y.transpose(0, 5, 1, 6, 3, 2, 4, 7)        # (n, k, a, l, b, q, r, c)
    return y.reshape(n, 2 * h, 2 * w, 4 * c)
