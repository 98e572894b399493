"""Golden parity: flax ModelB2 vs the reference torch checkpoints.

Fixtures in golden/ were produced by tools/make_golden.py running the
*reference* model on the released state dicts; these tests run the converted
weights through the JAX rebuild and assert numerical agreement.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sifsr_tpu.models import ModelB2, load_torch_checkpoint

from conftest import require_golden

CHECKPOINTS = ["modelB_1009", "modelB_2609", "modelB_2011"]


def _forward(variables, x_nchw):
    model = ModelB2()
    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))  # NCHW -> NHWC
    y = model.apply(variables, x, train=False)
    return np.asarray(y).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("name", CHECKPOINTS)
def test_forward_parity_random_inputs(name):
    fx = np.load(require_golden(f"modelB_forward_{name}.npz"))
    variables = load_torch_checkpoint(f"/root/reference/models/{name}/modelB_state_dict.pt")
    got = _forward(variables, fx["rand_input"])
    want = fx["rand_output"]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


@pytest.mark.parametrize("name", CHECKPOINTS)
def test_forward_parity_real_pair(name):
    fx = np.load(require_golden(f"modelB_forward_{name}.npz"))
    variables = load_torch_checkpoint(f"/root/reference/models/{name}/modelB_state_dict.pt")
    got = _forward(variables, fx["real_input"])
    np.testing.assert_allclose(got, fx["real_output"], rtol=1e-4, atol=5e-5)


def test_param_count_matches_reference():
    """Exactly the reference's learnable parameter count (282,705 — counted
    from modelB_1009's state dict excluding BN running stats)."""
    import jax

    variables = load_torch_checkpoint(
        "/root/reference/models/modelB_1009/modelB_state_dict.pt"
    )
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert n == 282_705


def test_init_shapes_match_converted():
    """A fresh init produces the same tree structure as the converter."""
    import jax

    model = ModelB2()
    init_vars = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 2)), train=False)
    conv_vars = load_torch_checkpoint(
        "/root/reference/models/modelB_1009/modelB_state_dict.pt"
    )
    init_shapes = jax.tree.map(lambda a: a.shape, init_vars)
    conv_shapes = jax.tree.map(lambda a: a.shape, dict(conv_vars))
    assert jax.tree.structure(init_shapes) == jax.tree.structure(conv_shapes)
    assert jax.tree.leaves(init_shapes) == jax.tree.leaves(conv_shapes)
