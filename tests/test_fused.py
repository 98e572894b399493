"""BN-folded inference model must match the standard eval-mode forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from sifsr_tpu.models import ModelB2, load_torch_checkpoint
from sifsr_tpu.models.fused import InferenceModelB2, fold_batchnorm, upsample_bilinear_x2_nhwc
from sifsr_tpu.ops.resize import upsample_bilinear_x2


def test_fused_matches_standard(rng):
    variables = load_torch_checkpoint(
        "/root/reference/models/modelB_1009/modelB_state_dict.pt"
    )
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 2)).astype(np.float32))

    want = ModelB2().apply(variables, x, train=False)
    fused = InferenceModelB2(precision=lax.Precision.HIGHEST)
    got = fused.apply(fold_batchnorm(variables), x)
    # per-layer fold error is ~3e-6 (associativity of W*s vs conv*s); it
    # amplifies through 14 layers of BN scales to ~1e-3 absolute at the output
    # — negligible next to the bf16 serving noise floor (~1e-2 K).
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=2e-3)


def test_fused_init_tree_matches_folded(rng):
    variables = load_torch_checkpoint(
        "/root/reference/models/modelB_1009/modelB_state_dict.pt"
    )
    folded = fold_batchnorm(variables)
    init = InferenceModelB2().init(jax.random.key(0), jnp.zeros((1, 64, 64, 2)))
    assert jax.tree.structure(jax.tree.map(lambda a: a.shape, dict(init))) == jax.tree.structure(
        jax.tree.map(lambda a: a.shape, folded)
    )
    got = jax.tree.leaves(jax.tree.map(lambda a: a.shape, dict(init)))
    want = jax.tree.leaves(jax.tree.map(lambda a: a.shape, folded))
    assert got == want


def test_nhwc_bilinear_matches_nchw(rng):
    x = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    want = np.moveaxis(
        np.asarray(upsample_bilinear_x2(jnp.moveaxis(jnp.asarray(x), -1, 1))), 1, -1
    )
    got = np.asarray(upsample_bilinear_x2_nhwc(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fused_pad_impl_matches_explicit(rng):
    """The serving fast path's pad_impl='fused' (make_sr_step default) must
    agree with the explicit-pad BN-folded forward to float summation order
    everywhere, including the border ring the correction patches."""
    variables = load_torch_checkpoint(
        "/root/reference/models/modelB_1009/modelB_state_dict.pt"
    )
    folded = fold_batchnorm(variables)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 2)).astype(np.float32))

    want = InferenceModelB2(precision=lax.Precision.HIGHEST).apply(folded, x)
    got = InferenceModelB2(precision=lax.Precision.HIGHEST,
                           pad_impl="fused").apply(folded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_make_sr_step_pad_impls_agree():
    """End-to-end serving step (normalise + bicubic + forward + de-normalise)
    in Kelvin: fused vs explicit pads must agree far below the bf16 noise
    floor of the path (~0.03 K rmse vs f32, tests above)."""
    import json

    from sifsr_tpu.data.statistics import Statistics
    from sifsr_tpu.inference import make_sr_step

    variables = load_torch_checkpoint(
        "/root/reference/models/modelB_1009/modelB_state_dict.pt"
    )
    with open("data/statistics_testset.json") as f:
        stats = Statistics(**json.load(f))
    r = np.random.default_rng(0)
    lst = jnp.asarray((290.0 + 8.0 * r.random((3, 64, 64))).astype(np.float32))
    ndvi = jnp.asarray((r.random((3, 256, 256)) * 0.8).astype(np.float32))

    outs = {}
    for pi in ("explicit", "fused"):
        step = make_sr_step(ModelB2(), stats, jnp.float32, True, pad_impl=pi)
        outs[pi] = np.asarray(step(variables, lst, ndvi))
    d = np.abs(outs["fused"] - outs["explicit"])
    assert d.max() < 1e-3, f"f32 fused-vs-explicit max|d|={d.max()} K"
