"""Device-mesh parallelism: data-parallel training and batched inference."""

from sifsr_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    make_parallel_train_step,
    make_parallel_apply,
)
