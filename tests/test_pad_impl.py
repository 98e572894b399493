"""The fused replicate-pad conv path (models.unet.Conv3x3 pad_impl='fused').

The explicit path materialises a (N, H+2, W+2, C) copy of every conv input —
profiled at ~44% of the bf16 train-step wall (tools/profile_train.py, r4).
The fused path (zero-SAME conv + border-ring correction) must agree with it
to float summation order everywhere, including gradients, and must not
change parameter names, shapes, or seeded initial values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from sifsr_tpu.models.unet import _DN, ModelB2, _replicate_conv_fused


def _explicit(x, w):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return lax.conv_general_dilated(xp, w, (1, 1), "VALID",
                                    dimension_numbers=_DN,
                                    precision=lax.Precision.HIGHEST)


@pytest.mark.parametrize("shape", [(2, 6, 7, 3, 5), (1, 5, 5, 1, 1),
                                   (3, 8, 6, 4, 2), (1, 3, 3, 2, 2)])
def test_fused_matches_explicit_pad_conv(shape):
    n, h, w_, cin, k = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, h, w_, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, k)), jnp.float32)
    ref = _explicit(x, w)
    got = _replicate_conv_fused(x, w, lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_fused_gradients_match_explicit():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 7, 6, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 4)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((2, 7, 6, 4)), jnp.float32)

    def loss(fn):
        def f(x, w):
            return jnp.vdot(fn(x, w), cot)
        return jax.grad(f, argnums=(0, 1))

    gx_r, gw_r = loss(_explicit)(x, w)
    gx_f, gw_f = loss(
        lambda x, w: _replicate_conv_fused(x, w, lax.Precision.HIGHEST))(x, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.slow
def test_model_fused_init_identical_and_forward_close():
    m_e = ModelB2()
    m_f = ModelB2(pad_impl="fused")
    v_e = m_e.init(jax.random.key(0), jnp.zeros((1, 64, 64, 2)), train=False)
    v_f = m_f.init(jax.random.key(0), jnp.zeros((1, 64, 64, 2)), train=False)
    assert jax.tree.all(
        jax.tree.map(lambda a, b: bool(jnp.array_equal(a, b)), v_e, v_f)
    ), "pad_impl must not change parameters or their seeded init"

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 2)), jnp.float32)
    y_e = m_e.apply(v_e, x, train=False)
    y_f = m_f.apply(v_e, x, train=False)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_e),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_train_step_fused_tracks_explicit():
    """A few predef_filters steps with each pad_impl stay numerically close
    (same data, same seed) — the fused path is a drop-in training fast path."""
    from sifsr_tpu.data import make_synthetic_dataset
    from sifsr_tpu.data.datasets import prepare_batch
    from sifsr_tpu.train.state import create_train_state
    from sifsr_tpu.train.step import make_train_step

    ds = make_synthetic_dataset(4, seed=0)
    raw = next(ds.batches(4, seed=0))
    batch = prepare_batch({k: jnp.asarray(v) for k, v in raw.items()})

    losses = {}
    for impl in ("explicit", "fused"):
        model = ModelB2(pad_impl=impl)
        state = create_train_state(model, 1e-3, rng=jax.random.key(0),
                                   input_hw=(256, 256))
        step = make_train_step(model, "predef_filters", alpha=0.99,
                               gamma=-0.5, mean_lst=295.0, std_lst=10.0,
                               with_metrics=False)
        ls = []
        for _ in range(3):
            state, m = step(state, batch)
            ls.append(float(m["loss"]))
        losses[impl] = ls
    np.testing.assert_allclose(losses["fused"], losses["explicit"],
                               rtol=1e-4, atol=1e-5)
