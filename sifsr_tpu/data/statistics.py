"""Dataset normalisation statistics (reference data_preparation.py:68-105).

The reference computes global train-split statistics (max/min of LST, mean/std
of LST and NDVI) once and stores them in data/statistics.json; every dataset,
training loss, predictor and evaluator consumes them. Same here, as a frozen
dataclass with the reference's exact JSON field names.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np

__all__ = ["Statistics", "compute_statistics"]


@dataclasses.dataclass(frozen=True)
class Statistics:
    maxi: float
    mini: float
    mean_lst: float
    std_lst: float
    mean_ndvi: float
    std_ndvi: float

    @classmethod
    def from_json(cls, path: str) -> "Statistics":
        with open(path) as f:
            d = json.load(f)
        return cls(
            maxi=d["maxi"],
            mini=d["mini"],
            mean_lst=d["mean_lst"],
            std_lst=d["std_lst"],
            mean_ndvi=d["mean_ndvi"],
            std_ndvi=d["std_ndvi"],
        )

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=1)


def compute_statistics(lst_images, ndvi_images) -> Statistics:
    """Global statistics over iterables of LST / NDVI arrays (train split
    only, reference data_preparation.py:85-105: a running mean of per-image
    means/stds and a running max/min)."""
    maxi, mini = -np.inf, np.inf
    lst_means, lst_stds, ndvi_means, ndvi_stds = [], [], [], []
    for lst in lst_images:
        maxi = max(maxi, float(np.max(lst)))
        mini = min(mini, float(np.min(lst)))
        lst_means.append(float(np.mean(lst)))
        lst_stds.append(float(np.std(lst)))
    for ndvi in ndvi_images:
        ndvi_means.append(float(np.mean(ndvi)))
        ndvi_stds.append(float(np.std(ndvi)))
    return Statistics(
        maxi=maxi,
        mini=mini,
        mean_lst=float(np.mean(lst_means)),
        std_lst=float(np.mean(lst_stds)),
        mean_ndvi=float(np.mean(ndvi_means)),
        std_ndvi=float(np.mean(ndvi_stds)),
    )
