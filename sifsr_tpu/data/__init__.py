"""Host data pipeline: manifests, normalisation statistics, batch iterators."""

from sifsr_tpu.data.statistics import Statistics, compute_statistics
from sifsr_tpu.data.datasets import (
    ModisDataset,
    ArrayDataset,
    normalize,
    denormalize,
    degrade_batch_scale_invariance,
    make_synthetic_dataset,
)
