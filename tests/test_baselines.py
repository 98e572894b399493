"""Baseline sharpeners: behavioural sanity + reconstruction-property tests.

Parity strategy: these methods are stochastic-free given inputs, so we test
the *defining properties* each algorithm must satisfy (exact reconstruction
under linear LST~NDVI relationships, residual-mean preservation, mask
semantics) plus shape/finiteness on realistic synthetic patches.
"""

import numpy as np
import pytest

from sifsr_tpu.baselines import atprk, aatprk, bicubic_sr, dms_sharpen, tsharp
from sifsr_tpu.baselines.atprk import empirical_variogram


def _synthetic_pair(rng, n=64, factor=4):
    """Anticorrelated LST/NDVI with smooth structure + noise, Kelvin range."""
    f = n * factor
    yy, xx = np.meshgrid(np.linspace(0, 4, f), np.linspace(0, 4, f), indexing="ij")
    ndvi_fine = 0.45 + 0.3 * np.sin(yy * 1.7) * np.cos(xx * 1.3) + 0.05 * rng.normal(size=(f, f))
    ndvi_fine = np.clip(ndvi_fine, -1, 1)
    lst_fine = 300.0 - 12.0 * ndvi_fine + 0.3 * rng.normal(size=(f, f))
    lst_coarse = lst_fine.reshape(n, factor, n, factor).mean(axis=(1, 3))
    ndvi_coarse = ndvi_fine.reshape(n, factor, n, factor).mean(axis=(1, 3))
    return lst_coarse, ndvi_coarse, ndvi_fine, lst_fine


def test_bicubic_shape(rng):
    lst = (290 + 5 * rng.random((64, 64))).astype(np.float32)
    out = bicubic_sr(lst)
    assert out.shape == (256, 256)


def test_tsharp_exact_for_linear_relationship(rng):
    """If LST = a + b*NDVI exactly, TsHARP must reproduce the fine field."""
    n, factor = 32, 4
    f = n * factor
    ndvi_fine = 0.4 + 0.3 * np.sin(np.linspace(0, 6, f))[:, None] * np.cos(np.linspace(0, 5, f))[None, :]
    lst_fine = 300.0 - 10.0 * ndvi_fine
    ndvi_coarse = ndvi_fine.reshape(n, factor, n, factor).mean(axis=(1, 3))
    lst_coarse = 300.0 - 10.0 * ndvi_coarse  # consistent coarse observation
    out = tsharp(lst_coarse, ndvi_coarse, ndvi_fine, factor, min_t=273)
    np.testing.assert_allclose(out, lst_fine, atol=1e-6)


def test_tsharp_beats_bicubic_on_ndvi_driven_field(rng):
    lst_coarse, ndvi_coarse, ndvi_fine, lst_fine = _synthetic_pair(rng)
    sharp = tsharp(lst_coarse, ndvi_coarse, ndvi_fine, 4, min_t=273)
    bic = bicubic_sr(lst_coarse)
    rmse_sharp = np.sqrt(np.mean((sharp - lst_fine) ** 2))
    rmse_bic = np.sqrt(np.mean((bic - lst_fine) ** 2))
    assert rmse_sharp < rmse_bic


def test_empirical_variogram_monotone_for_smooth_field(rng):
    """A smooth random field's semivariogram grows with distance."""
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    field = np.sin(yy / 9.0) + np.cos(xx / 7.0) + 0.01 * rng.normal(size=(64, 64))
    pd_uni, gamma, pd_c = empirical_variogram(field, block_size=5, scc=926.0)
    assert gamma[0] == 0.0
    assert gamma[1] < gamma[-1]
    assert pd_c.shape == (25, 25)


@pytest.mark.parametrize("method", [atprk, aatprk])
def test_atprk_family_runs_and_improves(rng, method):
    lst_coarse, ndvi_coarse, ndvi_fine, lst_fine = _synthetic_pair(rng)
    out = method(lst_coarse, ndvi_coarse, ndvi_fine, scale=4, scc=926, block_size=5, min_t=273)
    assert out.shape == (256, 256)
    assert np.isfinite(out).all()
    interior = np.s_[16:-16, 16:-16]
    rmse = np.sqrt(np.mean((out[interior] - lst_fine[interior]) ** 2))
    rmse_bic = np.sqrt(np.mean((bicubic_sr(lst_coarse)[interior] - lst_fine[interior]) ** 2))
    assert rmse < rmse_bic


@pytest.mark.slow
def test_dms_runs_and_preserves_coarse_means(rng):
    lst_coarse, ndvi_coarse, ndvi_fine, lst_fine = _synthetic_pair(rng)
    out = dms_sharpen(lst_coarse, ndvi_fine, factor=4)
    assert out.shape == (256, 256)
    assert np.isfinite(out).all()
    # the radiance-space residual correction re-imposes coarse consistency
    agg = (out**4).reshape(64, 4, 64, 4).mean(axis=(1, 3)) ** 0.25
    interior = np.s_[2:-2, 2:-2]
    np.testing.assert_allclose(agg[interior], lst_coarse[interior], rtol=2e-3)
    rmse = np.sqrt(np.mean((out - lst_fine) ** 2))
    rmse_bic = np.sqrt(np.mean((bicubic_sr(lst_coarse) - lst_fine) ** 2))
    assert rmse < rmse_bic


@pytest.mark.slow
def test_dms_moving_window_local_regressors(rng):
    """movingWindowSize > 0 path (reference data_mining_sharpener.py:649-872):
    local per-window models + inverse-residual combination with the global
    model. On data whose NDVI->LST relation flips sign between the left and
    right halves, local windows must beat the global-only model."""
    from sifsr_tpu.baselines.dms import DecisionTreeSharpener

    f = 4
    gh = gw = 32  # coarse grid
    ndvi = (0.2 + 0.6 * rng.random((gh * f, gw * f))).astype(np.float64)
    # spatially varying regime: LST = 300 - 20*NDVI left, 280 + 20*NDVI right
    xx = np.arange(gw * f)[None, :] >= (gw * f) // 2
    lst_fine = np.where(xx, 280.0 + 20.0 * ndvi, 300.0 - 20.0 * ndvi)
    lst_coarse = lst_fine.reshape(gh, f, gw, f).mean(axis=(1, 3))

    def rmse(pred):
        return float(np.sqrt(np.mean((pred - lst_fine) ** 2)))

    glob = DecisionTreeSharpener(factor=f, random_state=0)
    glob.train(ndvi, lst_coarse)
    e_glob = rmse(glob.residual_correction(glob.apply(ndvi), lst_coarse))

    mw = DecisionTreeSharpener(factor=f, random_state=0, moving_window_size=8)
    mw.train(ndvi, lst_coarse)
    assert len(mw.local_regs) == 16  # 4x4 windows over the 32x32 coarse grid
    assert sum(r is not None for _, r in mw.local_regs) >= 12
    pred_mw = mw.apply(ndvi, lst_coarse)
    e_mw = rmse(mw.residual_correction(pred_mw, lst_coarse))

    assert np.isfinite(pred_mw).all()
    assert e_mw < e_glob  # local regressors resolve the regime change

    # without lst_coarse, windowed-only predictions are used (reference
    # :856-858) and still beat global-only on this data
    pred_nolr = mw.apply(ndvi)
    assert rmse(mw.residual_correction(pred_nolr, lst_coarse)) < e_glob
