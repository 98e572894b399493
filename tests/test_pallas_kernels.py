"""Pallas kernels vs the reference-parity ops (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sifsr_tpu.ops.pooling import norm_l4_downsample
from sifsr_tpu.ops.psf import downscale_lst_sr_to_lr

MEAN, STD = 295.0, 10.0


def _reference_chain(x):
    unnorm = x * STD + MEAN
    down = downscale_lst_sr_to_lr(unnorm)
    return (down - MEAN) / STD


@pytest.mark.parametrize("interpret", [True])
def test_fused_psf_downscale_matches_ops(rng, interpret, monkeypatch):
    # run the pallas kernel in interpreter mode (no TPU in unit tests)
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr("sifsr_tpu.pallas.fused_ops.pl.pallas_call", interp_call)
    from sifsr_tpu.pallas.fused_ops import fused_psf_downscale

    x = rng.normal(size=(3, 256, 256)).astype(np.float32)
    want = np.asarray(_reference_chain(jnp.asarray(x)))
    got = np.asarray(fused_psf_downscale(jnp.asarray(x), MEAN, STD))
    assert got.shape == (3, 64, 64)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_norm_l4_matches_ops(rng, monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr("sifsr_tpu.pallas.fused_ops.pl.pallas_call", interp_call)
    from sifsr_tpu.pallas.fused_ops import fused_norm_l4

    x = rng.normal(size=(2, 64, 64)).astype(np.float32)
    want = np.asarray(norm_l4_downsample(jnp.asarray(x) * STD + MEAN, 4))
    got = np.asarray(fused_norm_l4(jnp.asarray(x), MEAN, STD, renorm=False))
    np.testing.assert_allclose(got, want, rtol=1e-5)
