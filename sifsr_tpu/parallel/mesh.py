"""jax.sharding mesh utilities for SPMD training/inference.

Strategy (SURVEY.md §5): the network is ~283k parameters (≈1.1 MB f32) while
each 256² training example is ~0.8 MB — this is a *data-bound* problem, so the
parallelism is 1-D **data parallelism** over a ('data',) mesh:

- parameters / optimiser state / BN stats: replicated;
- batches: sharded on the leading axis;
- gradient all-reduce and global BatchNorm statistics fall out of XLA's SPMD
  partitioner automatically — the train step is written once (train.step) and
  jit-compiled with sharding annotations, no pmap/collective plumbing.

TP/PP would add latency for zero benefit at this size (the whole weight set
fits in a fraction of one core's VMEM); spatial tiling of whole granules is
handled as batch parallelism over patch blocks (see inference.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "make_parallel_train_step",
    "make_parallel_apply",
]


def make_mesh(n_devices: int = 0, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` local devices (0 = all)."""
    devices = jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Place a host batch dict on the mesh, sharded along the leading axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_parallel_train_step(train_step, mesh: Mesh, axis_name: str = "data"):
    """Wrap a (state, batch) -> (state, metrics) step with SPMD shardings.

    The state is replicated, the batch sharded on its leading axis; XLA's
    partitioner inserts the cross-chip psums for both the gradient reduction
    and the train-mode BatchNorm batch statistics.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        train_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
    )


def make_parallel_apply(apply_fn, mesh: Mesh, axis_name: str = "data"):
    """Shard a pure (variables, batch) -> outputs forward across the mesh;
    outputs stay batch-sharded (no gather) for zero-copy host reads."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    return jax.jit(apply_fn, in_shardings=(repl, data), out_shardings=data)
