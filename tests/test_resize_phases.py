"""Phase-separated Pallas upsample vs the exact matmul resize (interpret)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sifsr_tpu.ops.resize import resize_matrix
from sifsr_tpu.pallas.resize_phases import (
    phases_to_nhwc,
    phases_to_packed_x2,
    phases_to_packed_x4,
    upsample_phases,
)


def _ref_resize(x, factor, kind):
    n, h, w, c = x.shape
    mh = jnp.asarray(resize_matrix(h, factor * h, kind), jnp.float32)
    mw = jnp.asarray(resize_matrix(w, factor * w, kind), jnp.float32)
    y = jnp.einsum("oh,nhwc->nowc", mh, jnp.asarray(x),
                   precision=jax.lax.Precision.HIGHEST)
    return np.asarray(jnp.einsum("pw,nowc->nopc", mw, y,
                                 precision=jax.lax.Precision.HIGHEST))


@pytest.mark.parametrize("shape,factor,kind", [
    ((2, 64, 64, 1), 4, "cubic"),
    ((2, 32, 32, 16), 2, "linear_ac"),
    ((1, 64, 64, 32), 2, "linear_ac"),
])
def test_upsample_phases_matches_matmul(rng, shape, factor, kind):
    x = rng.standard_normal(shape).astype(np.float32)
    ref = _ref_resize(x, factor, kind)
    y = upsample_phases(jnp.asarray(x), factor, kind, interpret=True)
    got = np.asarray(phases_to_nhwc(y))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_upsample_phases_int8_epilogue(rng):
    x = rng.standard_normal((2, 32, 32, 16)).astype(np.float32)
    s = 0.043
    ref = _ref_resize(x, 2, "linear_ac")
    ref_q = np.clip(np.round(ref / s), -127, 127).astype(np.int8)
    y = upsample_phases(jnp.asarray(x), 2, "linear_ac", out_dtype=jnp.int8,
                        scale=s, interpret=True)
    got = np.asarray(phases_to_nhwc(y))
    diff = np.abs(got.astype(np.int32) - ref_q.astype(np.int32))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.01


def test_phases_to_packed_matches_s2d(rng):
    from sifsr_tpu.models.packed import _space_to_depth

    x = rng.standard_normal((2, 32, 32, 16)).astype(np.float32)
    y = upsample_phases(jnp.asarray(x), 2, "linear_ac", interpret=True)
    ref = np.asarray(_space_to_depth(jnp.asarray(_ref_resize(x, 2, "linear_ac"))))
    np.testing.assert_allclose(np.asarray(phases_to_packed_x2(y)), ref,
                               atol=1e-5, rtol=1e-5)

    x4 = rng.standard_normal((2, 32, 32, 1)).astype(np.float32)
    y4 = upsample_phases(jnp.asarray(x4), 4, "cubic", interpret=True)
    ref4 = np.asarray(_space_to_depth(jnp.asarray(_ref_resize(x4, 4, "cubic"))))
    np.testing.assert_allclose(np.asarray(phases_to_packed_x4(y4)), ref4,
                               atol=1e-5, rtol=1e-5)
