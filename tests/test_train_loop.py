"""Training-loop smoke tests: all three recipes learn on synthetic data;
early stopping and checkpoint/resume behave per the reference semantics."""

import numpy as np
import pytest

import jax

from sifsr_tpu.config import HyperParams, TrainConfig
from sifsr_tpu.data import make_synthetic_dataset
from sifsr_tpu.models.unet import ModelB2
from sifsr_tpu.train import EarlyStopping, train_loop


def _tiny_config(recipe, n_epochs=2, patience=5):
    return TrainConfig(
        hyper=HyperParams(
            batch_size=4, learning_rate=1e-3, n_epochs=n_epochs, patience=patience,
            alpha=0.99, gamma=-0.5,
        ),
        recipe=recipe,
        seed=0,
    )


@pytest.mark.parametrize("recipe", ["predef_filters", "gradftm", "scale_invariance"])
@pytest.mark.slow
def test_train_smoke_all_recipes(recipe):
    train_ds = make_synthetic_dataset(8, seed=1)
    val_ds = make_synthetic_dataset(4, seed=2)
    logs = []
    state, metrics = train_loop(
        _tiny_config(recipe), train_ds, val_ds, log_fn=logs.append
    )
    assert len(metrics["train_loss"]) == 2
    assert len(metrics["val_loss"]) == 2
    assert np.isfinite(metrics["train_loss"]).all()
    assert metrics["best_epoch"] in (1, 2)
    if recipe != "scale_invariance":
        assert "train_dsloss" in metrics and "val_perceploss" in metrics


@pytest.mark.slow
def test_training_reduces_loss():
    train_ds = make_synthetic_dataset(16, seed=3)
    val_ds = make_synthetic_dataset(8, seed=4)
    state, metrics = train_loop(
        _tiny_config("gradftm", n_epochs=4), train_ds, val_ds, log_fn=lambda s: None
    )
    assert metrics["train_loss"][-1] < metrics["train_loss"][0]


def test_early_stopping_reference_semantics():
    """Port of the model_checkpoint behaviour (utils.py:667-714)."""
    stopper = EarlyStopping(n_epochs=10, patience=2)
    stopper.update(1, 1.0, {"w": np.zeros(1)})
    assert stopper.best_epoch == 1 and not stopper.should_stop
    stopper.update(2, 0.5, {"w": np.ones(1)})          # improvement
    assert stopper.best_epoch == 2 and stopper.curr_patience == 0
    stopper.update(3, 0.5, {"w": np.full(1, 2.0)})     # tie counts AGAINST (>=)
    assert stopper.curr_patience == 1 and not stopper.should_stop
    stopper.update(4, 0.6, {"w": np.full(1, 3.0)})     # worse -> patience hit
    assert stopper.should_stop
    assert stopper.best_epoch == 2
    assert stopper.saved_state["w"][0] == 1.0          # best state retained


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    """Interrupt after 2 epochs; a fresh loop resumes and completes to 4 with
    identical metric history length and a populated best snapshot."""
    ckpt = str(tmp_path / "ckpt")
    train_ds = make_synthetic_dataset(8, seed=5)
    val_ds = make_synthetic_dataset(4, seed=6)

    cfg2 = _tiny_config("predef_filters", n_epochs=2)
    state_a, metrics_a = train_loop(
        cfg2, train_ds, val_ds, checkpoint_dir=ckpt, log_fn=lambda s: None
    )

    cfg4 = _tiny_config("predef_filters", n_epochs=4)
    logs = []
    state_b, metrics_b = train_loop(
        cfg4, train_ds, val_ds, checkpoint_dir=ckpt, log_fn=logs.append
    )
    assert any("resumed from epoch 2" in line for line in logs)
    assert len(metrics_b["train_loss"]) == 4
    assert metrics_b["train_loss"][:2] == metrics_a["train_loss"]


@pytest.mark.slow
def test_bf16_mixed_precision_learns():
    """bf16 compute dtype (f32 master weights + BN stats): the step runs,
    the loss decreases, and params stay f32."""
    import jax.numpy as jnp
    from jax import lax

    train_ds = make_synthetic_dataset(16, seed=7)
    val_ds = make_synthetic_dataset(4, seed=8)
    model = ModelB2(dtype=jnp.bfloat16, precision=lax.Precision.DEFAULT)
    state, metrics = train_loop(
        _tiny_config("predef_filters", n_epochs=3), train_ds, val_ds,
        model=model, log_fn=lambda s: None,
    )
    assert metrics["train_loss"][-1] < metrics["train_loss"][0]
    leaves = jax.tree.leaves(state.params)
    assert all(l.dtype == jnp.float32 for l in leaves)


@pytest.mark.slow  # compiles TWO full train steps (fwd+bwd+Adam), ~50 s
def test_remat_step_bit_identical():
    """config.remat wraps the forward+loss in jax.checkpoint — activations
    are recomputed in the backward pass (activation-HBM ceiling lifted for
    large batches) with IDENTICAL numerics: same grads, params, metrics."""
    from sifsr_tpu.data.datasets import prepare_batch
    from sifsr_tpu.data.statistics import Statistics
    from sifsr_tpu.train.state import create_train_state
    from sifsr_tpu.train.step import make_train_step

    stats = Statistics(maxi=330.0, mini=260.0, mean_lst=295.0, std_lst=10.0,
                       mean_ndvi=0.3, std_ndvi=0.25)
    ds = make_synthetic_dataset(4, seed=5)
    batch = prepare_batch(next(ds.batches(4, seed=0)))
    model = ModelB2()

    outs = {}
    for remat in (False, True):
        state = create_train_state(model, 1e-3, rng=jax.random.key(0))
        step = make_train_step(model, "predef_filters", 0.99, -0.5,
                               stats.mean_lst, stats.std_lst, remat=remat)
        state, metrics = step(state, batch)
        outs[remat] = (state, metrics)

    s0, m0 = outs[False]
    s1, m1 = outs[True]
    for k in m0:
        assert float(m0[k]) == float(m1[k]), k
    flat0 = jax.tree_util.tree_leaves(s0.params)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(flat0, flat1))
