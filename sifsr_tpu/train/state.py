"""Train state: params + BN batch_stats + Adam optimiser state."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from sifsr_tpu.models.unet import ModelB2

__all__ = ["SifTrainState", "create_train_state"]


class SifTrainState(struct.PyTreeNode):
    """Minimal functional train state (params, BN stats, optimiser)."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def create_train_state(
    model: ModelB2,
    learning_rate: float,
    rng: jax.Array | None = None,
    variables: dict | FrozenDict | None = None,
    input_hw: tuple[int, int] = (256, 256),
) -> SifTrainState:
    """Initialise (or adopt converted ``variables``) + torch-default Adam.

    optax.adam with eps_root=0 matches torch.optim.Adam's update rule
    (m̂ / (sqrt(v̂) + eps)) including bias correction.
    """
    if variables is None:
        if rng is None:
            rng = jax.random.key(0)
        variables = model.init(
            rng, jnp.zeros((1, *input_hw, model.in_channels)), train=False
        )
    tx = optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8, eps_root=0.0)
    return SifTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
