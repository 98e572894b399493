"""Test configuration: run everything on a virtual 8-device CPU mesh.

TPU hardware in CI is a single chip; multi-chip sharding is validated on the
XLA CPU backend with 8 virtual devices (the standard JAX pattern for testing
pjit/shard_map layouts without a pod).

Env vars must be set before jax initialises, hence the top-of-file placement.
"""

import os
import sys

# The axon sitecustomize (PYTHONPATH) registers a remote-TPU PJRT plugin at
# interpreter startup whenever PALLAS_AXON_POOL_IPS is set, and that
# registration overrides JAX_PLATFORMS. Unit tests must run on the local CPU
# backend (8 virtual devices for sharding tests), so if the plugin env is
# present we scrub it and re-exec pytest before jax can initialise.
# This machine's axon sitecustomize registers a remote-TPU PJRT plugin at
# interpreter startup and the terminal env pins JAX_PLATFORMS=axon; jax may
# already be imported before conftest (the jaxtyping pytest plugin pulls it
# in), binding that env value into jax.config. Unit tests must run on the
# local CPU backend with 8 virtual devices (for the sharding tests), so we
# update jax.config directly before any backend initialises.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is XLA-CPU COMPILE-bound (hundreds of small jits, executions of
# tiny shapes). Backend optimization level 0 halves compile wall (measured
# 2.4 -> 1.0 s on the full-size forward) and changes scheduling/fusion only,
# not math semantics: exactness tests compare against an XLA reference built
# in the same process, and golden-file parity tests carry tolerances.
# Override with SIFSR_TEST_XLA_OPT=1 to run the suite at default opt level.
if "xla_backend_optimization_level" not in flags and not os.environ.get(
        "SIFSR_TEST_XLA_OPT"):
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the CPU backend; axon plugin leaked through"
)
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for sharding tests"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"
GOLDEN = os.path.join(os.path.dirname(__file__), os.pardir, "golden")


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    # regardless of execution order or -k selections
    return np.random.default_rng(42)


def golden_path(name: str) -> str:
    return os.path.abspath(os.path.join(GOLDEN, name))


def require_golden(name: str):
    path = golden_path(name)
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} not generated (run tools/make_golden.py)")
    return path
