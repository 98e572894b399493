"""Space-to-depth packed serving forward vs the standard eval forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sifsr_tpu.data.statistics import Statistics
from sifsr_tpu.inference import make_sr_step
from sifsr_tpu.models import ModelB2, load_torch_checkpoint
from sifsr_tpu.models.packed import (
    _depth_to_space,
    _packed_resize,
    _phase_matrices,
    _replicate_pad_packed,
    _space_to_depth,
    make_packed_sr_step,
    pack_conv_weights,
    pack_serving_params,
)

STATS = Statistics(maxi=330.0, mini=260.0, mean_lst=295.0, std_lst=10.0,
                   mean_ndvi=0.3, std_ndvi=0.25)


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    packed = _space_to_depth(x)
    assert packed.shape == (2, 8, 8, 12)
    back = _depth_to_space(packed, 3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_packed_conv_weights_equivalence(rng):
    """Packed conv on packed input == unpacked conv (replicate pad) on the
    original, for random weights."""
    from jax import lax

    c_in, c_out, h = 3, 5, 16
    x = jnp.asarray(rng.normal(size=(1, h, h, c_in)).astype(np.float32))
    w = rng.normal(size=(3, 3, c_in, c_out)).astype(np.float32)
    b = rng.normal(size=(c_out,)).astype(np.float32)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    want = lax.conv_general_dilated(
        xp, jnp.asarray(w), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    ) + b

    wp, bp = pack_conv_weights(w, b)
    x_packed = _space_to_depth(x)
    x_padded = _replicate_pad_packed(x_packed, c_in)
    got_p = lax.conv_general_dilated(
        x_padded, jnp.asarray(wp), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    ) + jnp.asarray(bp)
    got = _depth_to_space(got_p, c_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_packed_resize_matches_plain(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    phases = jnp.asarray(_phase_matrices(8, 16, "linear_ac"))
    packed = _packed_resize(x, phases)
    from sifsr_tpu.models.fused import upsample_bilinear_x2_nhwc

    want = upsample_bilinear_x2_nhwc(x)
    got = _depth_to_space(packed, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.slow
def test_packed_serving_matches_standard():
    """End-to-end: packed f32 serving == standard f32 serving on the real
    released weights (both BN-folded paths)."""
    variables = load_torch_checkpoint(
        "/root/reference/models/modelB_1009/modelB_state_dict.pt"
    )
    model = ModelB2()
    rng = np.random.default_rng(7)
    lst = jnp.asarray(290.0 + 5.0 * rng.random((2, 64, 64)), jnp.float32)
    ndvi = jnp.asarray(rng.random((2, 256, 256)) * 0.8, jnp.float32)

    std_step = make_sr_step(model, STATS, compute_dtype=jnp.float32)
    want = np.asarray(std_step(variables, lst, ndvi))

    packed_params = pack_serving_params(variables)
    packed_step = make_packed_sr_step(STATS, compute_dtype=jnp.float32)
    got = np.asarray(packed_step(packed_params, lst, ndvi))

    assert got.shape == want.shape == (2, 256, 256)
    # identical math modulo float associativity through 14 layers
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-3)
