"""Worker for the 2-process jax.distributed CPU parity test
(tests/test_multiprocess.py — VERDICT r4 ask 6; SURVEY §5 names
jax.distributed initialization as the multi-host story).

Each process owns 4 virtual CPU devices of an 8-device global ('data',)
mesh, loads ONLY its local half of the global batch (process-spanning data
loading via jax.make_array_from_process_local_data), runs ONE jitted
data-parallel predef_filters train step (gradient all-reduce + global
BatchNorm statistics fall out of the GSPMD partitioner), and prints the loss
and a parameter checksum. Run with no argv for the single-process 8-device
twin the test compares against.

Usage: python multiproc_worker.py [<process_id> <num_processes> <port>]
"""

import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

MULTI = len(sys.argv) > 1
N_GLOBAL_DEVICES = 8
if MULTI:
    PID, NPROC, PORT = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    local = N_GLOBAL_DEVICES // NPROC
else:
    PID, NPROC = 0, 1
    local = N_GLOBAL_DEVICES
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "")
    + f" --xla_force_host_platform_device_count={local}"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if MULTI:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"localhost:{PORT}", num_processes=NPROC,
                               process_id=PID)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from sifsr_tpu.data import make_synthetic_dataset  # noqa: E402
from sifsr_tpu.data.datasets import prepare_batch  # noqa: E402
from sifsr_tpu.models.unet import ModelB2  # noqa: E402
from sifsr_tpu.parallel.mesh import make_parallel_train_step  # noqa: E402
from sifsr_tpu.train.state import create_train_state  # noqa: E402
from sifsr_tpu.train.step import make_train_step  # noqa: E402


def main():
    assert len(jax.devices()) == N_GLOBAL_DEVICES, jax.devices()
    mesh = Mesh(np.asarray(jax.devices()).reshape(N_GLOBAL_DEVICES), ("data",))

    model = ModelB2(downchannels=(8, 16, 32, 64))
    state = create_train_state(model, 1e-3, rng=jax.random.key(0),
                               input_hw=(256, 256))
    step = make_train_step(model, "predef_filters", alpha=0.99, gamma=-0.5,
                           mean_lst=295.0, std_lst=10.0, with_metrics=False,
                           mesh=mesh)
    pstep = make_parallel_train_step(step, mesh)

    # the GLOBAL batch is deterministic; each process materialises ONLY its
    # local shard rows (process-spanning data loading)
    global_batch = prepare_batch(next(
        make_synthetic_dataset(N_GLOBAL_DEVICES, seed=0).batches(
            N_GLOBAL_DEVICES, seed=0)))
    rows_per_proc = N_GLOBAL_DEVICES // NPROC
    lo, hi = PID * rows_per_proc, (PID + 1) * rows_per_proc
    sharding = NamedSharding(mesh, P("data"))
    batch = {
        k: jax.make_array_from_process_local_data(
            sharding, np.asarray(v)[lo:hi], np.asarray(v).shape)
        for k, v in global_batch.items()
    }

    repl = NamedSharding(mesh, P())
    state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
    new_state, metrics = pstep(state, batch)
    loss = float(metrics["loss"])
    # parameter checksum over the updated replicated params: identical across
    # processes AND identical to the single-process run iff the gradient
    # all-reduce and BN cross-shard statistics are correct
    leaves = jax.tree.leaves(jax.device_get(new_state.params))
    checksum = float(sum(np.float64(np.sum(np.abs(l))) for l in leaves))
    print(f"RESULT pid={PID} loss={loss:.10f} checksum={checksum:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
