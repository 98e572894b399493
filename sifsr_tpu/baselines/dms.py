"""Data-Mining Sharpener (Gao et al. 2012), compact patch-aligned rebuild.

Covers the configuration the reference's evaluation actually uses
(model_perf_aster_formatds.py:230-250 on already-aligned patches, i.e. the
behaviour of data_mining_sharpener_modified.py with movingWindowSize=0):

- training pairs: NDVI aggregated to the coarse grid (per-block mean) vs the
  coarse LST; sub-pixel homogeneity CV = mean over bands of (block std /
  block mean) selects/weights samples (auto threshold at the 80th percentile,
  heterogeneous samples' weights halved);
- regressor: bagged ensemble (sklearn BaggingRegressor, default 10 trees) of
  decision trees with a ridge regression per leaf, extrapolation clamped to
  leaf_range * ratio beyond each leaf's target range (global tree:
  max_leaf_nodes=30, min_samples_leaf=10);
- prediction: per fine pixel from its NDVI;
- residual (bias) correction in radiance space: coarse residual
  LST⁴ - blockmean(pred⁴), bicubic-upsampled x4, added to pred⁴, ^0.25.

The moving-window local-regression machinery of the full DMS is deliberately
not rebuilt: the reference disables it for patches ("Only way to work with
patches == removing local regs", model_perf_aster_formatds.py:235).
"""

from __future__ import annotations

import numpy as np
from sklearn import ensemble, linear_model, tree

import jax.numpy as jnp

from sifsr_tpu.ops.resize import upsample_bicubic

__all__ = ["LeafLinearTreeRegressor", "DecisionTreeSharpener", "dms_sharpen"]


class LeafLinearTreeRegressor(tree.DecisionTreeRegressor):
    """Decision tree whose leaves each carry a ridge regression, with clamped
    extrapolation (reference data_mining_sharpener_modified.py:337-449)."""

    def __init__(self, extrapolation_ratio: float = 0.25, **tree_opts):
        super().__init__(**tree_opts)
        self.extrapolation_ratio = extrapolation_ratio
        self.leaf_models: dict = {}

    def fit(self, X, y, sample_weight=None, check_input=True):
        super().fit(X, y, sample_weight=sample_weight, check_input=check_input)
        leaf_pred = super().predict(X)
        self.leaf_models = {}
        for value in np.unique(leaf_pred):
            sel = leaf_pred == value
            ridge = linear_model.Ridge()
            ridge.fit(X[sel], y[sel])
            self.leaf_models[value] = (ridge, float(np.min(y[sel])), float(np.max(y[sel])))
        return self

    def predict(self, X, check_input=True):
        y = super().predict(X, check_input=check_input)
        for value, (ridge, lo, hi) in self.leaf_models.items():
            sel = y == value
            if np.any(sel):
                refined = ridge.predict(X[sel])
                slack = self.extrapolation_ratio * (hi - lo)
                y[sel] = np.clip(refined, lo - slack, hi + slack)
        return y


def _aggregate_blocks(fine: np.ndarray, factor: int):
    """Per coarse-cell mean and std of a fine (H, W) or (H, W, B) image."""
    if fine.ndim == 2:
        fine = fine[..., None]
    h, w, b = fine.shape
    blocks = fine.reshape(h // factor, factor, w // factor, factor, b)
    return blocks.mean(axis=(1, 3)), blocks.std(axis=(1, 3))


class DecisionTreeSharpener:
    """Patch-aligned DMS. train() -> apply() -> residual_correction()."""

    def __init__(
        self,
        cv_homogeneity_threshold: float = 0.0,
        minimum_sample_number: int = 10,
        disaggregating_temperature: bool = True,
        per_leaf_linear_regression: bool = True,
        extrapolation_ratio: float = 0.25,
        n_estimators: int = 10,
        factor: int = 4,
        random_state: int | None = 0,
    ):
        self.cv_threshold = cv_homogeneity_threshold
        self.auto_threshold = cv_homogeneity_threshold <= 0
        self.min_samples = minimum_sample_number
        self.disaggregating_temperature = disaggregating_temperature
        self.per_leaf = per_leaf_linear_regression
        self.extrapolation_ratio = extrapolation_ratio
        self.n_estimators = n_estimators
        self.factor = factor
        self.random_state = random_state
        self.reg = None

    def train(self, ndvi_fine: np.ndarray, lst_coarse: np.ndarray) -> "DecisionTreeSharpener":
        mean, std = _aggregate_blocks(np.asarray(ndvi_fine, np.float64), self.factor)
        safe_mean = np.where(mean == 0, 1e-6, mean)
        cv = (std / safe_mean).mean(axis=-1)
        cv[np.isnan(cv)] = 1000.0

        good = (
            np.isfinite(lst_coarse)
            & ~np.any(np.isnan(mean), axis=-1)
            & (cv > 0)
            & (cv < 1000)
        )
        if good.sum() < self.min_samples:
            raise ValueError("not enough valid training samples for DMS")

        threshold = (
            np.percentile(cv[good], 80) if self.auto_threshold else self.cv_threshold
        )
        homogeneous = (cv < threshold) & (cv > 0)

        x = mean[good]
        y = np.asarray(lst_coarse, np.float64)[good]
        w = 1.0 / cv[good]
        if w.size > 1:
            w = (w - w.min()) / (w.max() - w.min())
            w[~homogeneous[good]] /= 2.0

        tree_opts = {"max_leaf_nodes": 30, "min_samples_leaf": min(self.min_samples, 10)}
        if self.per_leaf:
            base = LeafLinearTreeRegressor(self.extrapolation_ratio, **tree_opts)
        else:
            base = tree.DecisionTreeRegressor(**tree_opts)
        self.reg = ensemble.BaggingRegressor(
            base, n_estimators=self.n_estimators, random_state=self.random_state
        )
        self.reg.fit(x, y, sample_weight=w)
        return self

    def apply(self, ndvi_fine: np.ndarray) -> np.ndarray:
        if self.reg is None:
            raise RuntimeError("call train() first")
        fine = np.asarray(ndvi_fine, np.float64)
        if fine.ndim == 2:
            fine = fine[..., None]
        h, w, b = fine.shape
        return self.reg.predict(fine.reshape(-1, b)).reshape(h, w)

    def residual_correction(self, pred_fine: np.ndarray, lst_coarse: np.ndarray) -> np.ndarray:
        """Radiance-space bias correction (reference :1040-1084, :956-965)."""
        if self.disaggregating_temperature:
            pred_rad = np.asarray(pred_fine, np.float64) ** 4
            agg, _ = _aggregate_blocks(pred_rad, self.factor)
            residual_lr = np.asarray(lst_coarse, np.float64) ** 4 - agg[..., 0]
            residual_hr = np.asarray(
                upsample_bicubic(jnp.asarray(residual_lr, jnp.float32), self.factor)
            )
            return np.power(np.maximum(residual_hr + pred_rad, 0.0), 0.25)
        agg, _ = _aggregate_blocks(np.asarray(pred_fine, np.float64), self.factor)
        residual_lr = lst_coarse - agg[..., 0]
        residual_hr = np.asarray(
            upsample_bicubic(jnp.asarray(residual_lr, jnp.float32), self.factor)
        )
        return pred_fine + residual_hr


def dms_sharpen(lst_coarse: np.ndarray, ndvi_fine: np.ndarray, factor: int = 4) -> np.ndarray:
    """One-call DMS with the evaluation harness's options
    (model_perf_aster_formatds.py:230-250)."""
    sharpener = DecisionTreeSharpener(factor=factor)
    sharpener.train(ndvi_fine, lst_coarse)
    pred = sharpener.apply(ndvi_fine)
    return sharpener.residual_correction(pred, lst_coarse)
