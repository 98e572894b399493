"""Counted FLOP costs (sifsr_tpu.utils.flops) — the bench.py MFU numerators."""

import jax
import jax.numpy as jnp

from sifsr_tpu.utils.flops import modelb2_conv_flops, xla_flops
import pytest


def test_modelb2_conv_flops_reference_config():
    """The default config's counted per-patch conv cost (the PATCH_FLOPS
    constant bench.py reports MFU against). 3.605 GFLOP — the round-4 count
    of 2.85e9 mis-modelled the bilinear UpBlock mid channels (mid = in//2,
    reference model.py:208), understating ub1/ub2; the round-3 hardcoded
    3.0e9 guess was ~17% LOW, not 5% high."""
    assert modelb2_conv_flops() == 3605004288.0


def test_conv_flops_scale_quadratically_with_resolution():
    assert modelb2_conv_flops(hw=128) * 4 == modelb2_conv_flops(hw=256)


@pytest.mark.slow
def test_analytic_count_vs_xla_cost_analysis():
    """The analytic conv count must be a lower bound on (and the dominant
    part of) what XLA actually schedules for the serving step — the convs
    are the model; resize matmuls + elementwise make up the rest."""
    from sifsr_tpu.data.statistics import Statistics
    from sifsr_tpu.inference import make_sr_step
    from sifsr_tpu.models.unet import ModelB2

    model = ModelB2()
    stats = Statistics(maxi=330.0, mini=260.0, mean_lst=295.0, std_lst=10.0,
                       mean_ndvi=0.3, std_ndvi=0.25)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 2)),
                           train=False)
    step = make_sr_step(model, stats, compute_dtype=jnp.float32)
    lst = jnp.zeros((2, 16, 16))
    ndvi = jnp.zeros((2, 64, 64))
    total = xla_flops(jax.jit(step), variables, lst, ndvi)
    conv = 2 * modelb2_conv_flops(hw=64)
    assert conv < total < 2.5 * conv


def test_conv_lane_bound_properties():
    """The lane-utilisation bound (FUTURE.md training structural limit):
    fwd+bwd ~= 285 us/sample at the default plan, always >= the
    lane-ignorant FLOP floor, and backward roughly doubles it."""
    from sifsr_tpu.utils.flops import conv_lane_bound_s, modelb2_conv_flops

    fwd = conv_lane_bound_s(backward=False)
    full = conv_lane_bound_s()
    floor = modelb2_conv_flops() / 197e12
    assert fwd >= floor                      # lane waste only ever hurts
    assert 2.0 * fwd < full < 3.5 * fwd      # bwd = ~2 more conv passes
    assert abs(full * 1e6 - 285.1) < 1.0     # pin the documented number
