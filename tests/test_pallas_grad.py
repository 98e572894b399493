"""Gradient correctness of the fused pallas downscale (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sifsr_tpu.losses.losses import huber
from sifsr_tpu.ops.psf import downscale_lst_sr_to_lr

MEAN, STD = 295.0, 10.0


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr("sifsr_tpu.pallas.fused_ops.pl.pallas_call", interp_call)


def test_fused_downscale_gradient_matches_xla(rng):
    from sifsr_tpu.pallas.fused_ops import fused_psf_downscale

    x = jnp.asarray(rng.normal(size=(2, 64, 64)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(2, 16, 16)).astype(np.float32))

    def loss_pallas(x):
        return huber(fused_psf_downscale(x, MEAN, STD), t)

    def loss_xla(x):
        unnorm = x * STD + MEAN
        down = (downscale_lst_sr_to_lr(unnorm) - MEAN) / STD
        return huber(down, t)

    v_p, g_p = jax.value_and_grad(loss_pallas)(x)
    v_x, g_x = jax.value_and_grad(loss_xla)(x)
    assert abs(float(v_p) - float(v_x)) < 1e-5
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-6)
