"""Loss parity vs golden values computed with the torch reference composition
(tools/make_golden.py), plus a full one-step train parity check: after one
identical Adam step from the modelB_1009 weights, every parameter and BN
buffer must match torch's."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sifsr_tpu.losses import (
    ds_loss,
    huber,
    percep_loss_gradftm,
    percep_loss_predef,
    sif_loss_predef,
)
from sifsr_tpu.models import ModelB2, load_torch_checkpoint
from sifsr_tpu.train import create_train_state, make_train_step

from conftest import require_golden


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_huber_matches_torch_semantics(rng):
    a = rng.normal(size=(100,)).astype(np.float32) * 3
    b = rng.normal(size=(100,)).astype(np.float32)
    err = a - b
    want = np.mean(np.where(np.abs(err) < 1.0, 0.5 * err**2, np.abs(err) - 0.5))
    got = float(huber(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-6


def test_predef_losses_match_golden():
    fx = np.load(require_golden("losses_predef.npz"))
    sr, lst, ndvi = _nhwc(fx["sr"]), _nhwc(fx["lst"]), _nhwc(fx["ndvi"])
    dsl = float(ds_loss(sr, lst, float(fx["mean_lst"]), float(fx["std_lst"])))
    pl = float(percep_loss_predef(sr, ndvi, float(fx["gamma"])))
    assert abs(dsl - float(fx["ds_loss"])) < 2e-5
    assert abs(pl - float(fx["percep_loss"])) < 2e-5
    total, parts = sif_loss_predef(
        sr, lst, ndvi, float(fx["alpha"]), float(fx["gamma"]),
        float(fx["mean_lst"]), float(fx["std_lst"]),
    )
    assert abs(float(total) - float(fx["total"])) < 2e-5


def test_gradftm_losses_match_golden():
    fx = np.load(require_golden("losses_gradftm.npz"))
    sr, ndvi = _nhwc(fx["sr"]), _nhwc(fx["ndvi"])
    pl = float(percep_loss_gradftm(sr, ndvi, float(fx["gamma"])))
    assert abs(pl - float(fx["percep_loss"])) < 2e-5


@pytest.mark.slow
def test_one_train_step_matches_torch():
    """Full train-step parity: forward (train-mode BN), both losses, backward,
    Adam update, BN running-stat update — all must reproduce torch."""
    from sifsr_tpu.models.convert import convert_torch_state_dict

    fx = np.load(require_golden("train_step_predef.npz"))
    variables = load_torch_checkpoint(
        "/root/reference/models/modelB_1009/modelB_state_dict.pt"
    )
    model = ModelB2()
    state = create_train_state(model, 1e-3, variables=variables)
    step = make_train_step(
        model, "predef_filters", alpha=0.99, gamma=-0.5,
        mean_lst=295.0, std_lst=10.0, with_metrics=False,
    )
    batch = {
        "lst": _nhwc(fx["lst"]),
        "lst_up": _nhwc(fx["lst_up"]),
        "ndvi": _nhwc(fx["ndvi"]),
    }
    state, metrics = step(state, batch)

    assert abs(float(metrics["loss"]) - float(fx["loss"])) < 5e-5
    assert abs(float(metrics["ds_loss"]) - float(fx["ds_loss"])) < 5e-5
    assert abs(float(metrics["percep_loss"]) - float(fx["percep_loss"])) < 5e-5

    # post-step weights: convert torch's post state_dict and compare trees
    post_sd = {
        k[len("post__"):]: fx[k] for k in fx.files if k.startswith("post__")
    }
    want = convert_torch_state_dict(post_sd)

    got_params = jax.device_get(state.params)
    all_diffs = np.concatenate([
        np.abs(np.asarray(a) - np.asarray(b)).ravel()
        for a, b in zip(jax.tree.leaves(got_params),
                        jax.tree.leaves(want["params"]))
    ])
    # Adam normalises by sqrt(v̂): where v is tiny, float32 gradient
    # summation-order noise is amplified toward the lr scale. Observed max
    # ~1e-4 at default XLA opt, ~7.6e-4 under the test suite's
    # --xla_backend_optimization_level=0 (different fusion/summation order;
    # conftest.py) — only a handful of tiny-v elements sit there, so the
    # bulk-of-parameters check stays tight while the max allows the
    # amplified tail (a real train-step bug shifts weights at the full
    # lr=1e-3 scale across the board, which both bounds catch).
    max_diff = float(all_diffs.max())
    q999 = float(np.quantile(all_diffs, 0.999))
    assert q999 < 1e-4, f"bulk param mismatch after one Adam step: {q999}"
    assert max_diff < 1e-3, f"param mismatch after one Adam step: {max_diff}"

    got_bs = jax.device_get(state.batch_stats)
    bs_diffs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(a - b))), got_bs, want["batch_stats"]
    )
    assert max(jax.tree.leaves(bs_diffs)) < 5e-5, "BN running stats diverged"
