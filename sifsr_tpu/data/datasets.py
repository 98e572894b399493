"""Manifest-driven datasets and batch iterators (reference dataset.py rebuilt).

Differences from the reference's torch Datasets, by design:

- Patches are small (64² + 256² float32 ≈ 278 kB/pair), so the whole split is
  loaded once into pinned host arrays; batches are pure numpy slices — no
  per-item GDAL reads in the hot loop (reference dataset.py:124-125 re-reads
  both GeoTIFFs on *every* __getitem__).
- The bicubic x4 upsample and the scale-invariance degradation chain run
  *on device* inside jitted functions (ops.resize / ops.psf), not per-item on
  the host with cv2/torch (reference dataset.py:141, 257-263).
- Iteration order is reproducible from an explicit seed.

The manifest CSV format is the reference's ModisDatasetB.csv: columns
(index, LST, NDVI, split) where LST/NDVI are GeoTIFF paths and split is
Train/Val/Test; time-of-day filtering matches the reference's filename
substring test (dataset.py:74-79).
"""

from __future__ import annotations

from collections.abc import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from sifsr_tpu.data.statistics import Statistics
from sifsr_tpu.geo.tiff import read_geotiff
from sifsr_tpu.ops.psf import downscale_lst_sr_to_lr_test
from sifsr_tpu.ops.resize import upsample_bicubic

__all__ = [
    "normalize",
    "denormalize",
    "ArrayDataset",
    "ModisDataset",
    "degrade_batch_scale_invariance",
    "make_synthetic_dataset",
]


def normalize(lst: np.ndarray, ndvi: np.ndarray, stats: Statistics, transf: str = "norm"):
    """The reference's three normalisation modes (dataset.py:127-139)."""
    if transf == "norm":
        return (lst - stats.mean_lst) / stats.std_lst, (ndvi - stats.mean_ndvi) / stats.std_ndvi
    if transf == "0-1":
        return lst / stats.maxi, ndvi
    if transf == "-1_1":
        return 2.0 * (lst / stats.maxi - 0.5), ndvi
    raise ValueError(f"unknown transf {transf!r}")


def denormalize(lst: np.ndarray, stats: Statistics, transf: str = "norm"):
    if transf == "norm":
        return lst * stats.std_lst + stats.mean_lst
    if transf == "0-1":
        return lst * stats.maxi
    if transf == "-1_1":
        return (lst / 2.0 + 0.5) * stats.maxi
    raise ValueError(f"unknown transf {transf!r}")


class ArrayDataset:
    """In-memory dataset of normalised (lst, ndvi) pairs with batch iteration.

    lst: (M, 64, 64) float32 (normalised); ndvi: (M, 256, 256) float32.
    Yields NHWC batch dicts {'lst', 'ndvi'} — the device-side prep step adds
    'lst_up' (and the scale-invariance degradation when requested).
    """

    def __init__(self, lst: np.ndarray, ndvi: np.ndarray, stats: Statistics):
        assert lst.shape[0] == ndvi.shape[0]
        self.lst = np.ascontiguousarray(lst, dtype=np.float32)
        self.ndvi = np.ascontiguousarray(ndvi, dtype=np.float32)
        self.stats = stats

    def __len__(self) -> int:
        return self.lst.shape[0]

    def batches(
        self, batch_size: int, seed: int | None = None, drop_remainder: bool = True
    ) -> Iterator[dict]:
        order = np.arange(len(self))
        if seed is not None:
            np.random.default_rng(seed).shuffle(order)
        stop = len(self) - batch_size + 1 if drop_remainder else len(self)
        for start in range(0, max(stop, 0), batch_size):
            idx = order[start : start + batch_size]
            yield {
                "lst": self.lst[idx][..., None],
                "ndvi": self.ndvi[idx][..., None],
            }

    def n_batches(self, batch_size: int, drop_remainder: bool = True) -> int:
        if drop_remainder:
            return len(self) // batch_size
        return -(-len(self) // batch_size)


class ModisDataset(ArrayDataset):
    """ArrayDataset loaded from a reference-format manifest CSV."""

    def __init__(
        self,
        csv_path: str,
        stats: Statistics,
        split: str = "Train",
        time: str = "Both",
        transf: str = "norm",
    ):
        import csv as csv_mod

        lst_paths, ndvi_paths = [], []
        with open(csv_path, newline="") as f:
            reader = csv_mod.DictReader(f)
            for row in reader:
                if row.get("split") != split:
                    continue
                if time != "Both" and time not in row["LST"]:
                    continue
                lst_paths.append(row["LST"])
                ndvi_paths.append(row["NDVI"])

        # decode through the native multithreaded loader when built (a ~10x
        # faster cold start than sequential python decode; see
        # native/sifsr_native.cpp), else the pure-python reader
        from sifsr_tpu.data.native_loader import load_batch, native_available

        if lst_paths and native_available():
            lst = load_batch(lst_paths, 64, 64)
            ndvi = load_batch(ndvi_paths, 256, 256)
        else:
            from sifsr_tpu.data.native_loader import _read_band1

            lst = np.stack([_read_band1(read_geotiff, p) for p in lst_paths]) if lst_paths else np.zeros((0, 64, 64), np.float32)
            ndvi = np.stack([_read_band1(read_geotiff, p) for p in ndvi_paths]) if ndvi_paths else np.zeros((0, 256, 256), np.float32)
        lst, ndvi = normalize(lst.astype(np.float32), ndvi.astype(np.float32), stats, transf)
        super().__init__(lst, ndvi, stats)
        self.paths = list(zip(lst_paths, ndvi_paths))
        self.transf = transf


@jax.jit
def prepare_batch(batch: dict) -> dict:
    """Device-side prep for the standard recipes: add the bicubic x4 LST
    upsample as a model input channel (reference dataset.py:141, but jitted
    on device instead of per-item cv2 on the host)."""
    lst = batch["lst"]
    lst_up = jnp.moveaxis(upsample_bicubic(jnp.moveaxis(lst, -1, 1), 4), 1, -1)
    return {"lst": lst, "lst_up": lst_up, "ndvi": batch["ndvi"]}


def degrade_batch_scale_invariance(batch: dict, mean_lst: float, std_lst: float) -> dict:
    """Device-side scale-invariance degradation (reference dataset.py:257-263,
    quirks preserved — see ops.psf.downscale_lst_sr_to_lr_test):

      ndvi_1km   = pad+bicubic/4+crop of the 250 m NDVI      (256 -> 64)
      lst_4km    = norm-L4 pool of the un-normalised 1 km LST (64 -> 16)
      lst_4km_up = cv2-bicubic x4 of lst_4km, re-normalised   (16 -> 64)

    Returns {'lst_up': lst_4km_up, 'ndvi': ndvi_1km, 'lst': lst_1km} — the
    model learns 4 km -> 1 km against the real 1 km LST.
    """
    lst = jnp.moveaxis(batch["lst"], -1, 1)    # (N,1,64,64), normalised
    ndvi = jnp.moveaxis(batch["ndvi"], -1, 1)  # (N,1,256,256), normalised

    ndvi_1km = downscale_lst_sr_to_lr_test(ndvi, deci_type="bic")
    lst_unnorm = lst * std_lst + mean_lst
    lst_4km = downscale_lst_sr_to_lr_test(lst_unnorm, deci_type="norm-L4")
    lst_4km_up = upsample_bicubic(lst_4km, 4)
    lst_4km_up = (lst_4km_up - mean_lst) / std_lst

    return {
        "lst_up": jnp.moveaxis(lst_4km_up, 1, -1),
        "ndvi": jnp.moveaxis(ndvi_1km, 1, -1),
        "lst": batch["lst"],
    }


def make_synthetic_dataset(
    n: int, stats: Statistics | None = None, seed: int = 0
) -> ArrayDataset:
    """Deterministic synthetic LST/NDVI pairs for smoke tests and benches:
    smooth anticorrelated fields with realistic dynamic ranges."""
    rng = np.random.default_rng(seed)
    stats = stats or Statistics(
        maxi=330.0, mini=260.0, mean_lst=295.0, std_lst=10.0, mean_ndvi=0.3, std_ndvi=0.25
    )
    # low-frequency structure via frequency-domain shaping
    freqs_y = np.fft.fftfreq(256)[:, None]
    freqs_x = np.fft.fftfreq(256)[None, :]
    spectrum_shape = 1.0 / (1e-3 + np.hypot(freqs_y, freqs_x) ** 1.5)

    lst_list, ndvi_list = [], []
    for _ in range(n):
        phases = np.exp(2j * np.pi * rng.random((256, 256)))
        field = np.real(np.fft.ifft2(spectrum_shape * phases))
        field = (field - field.mean()) / (field.std() + 1e-9)
        ndvi = np.clip(0.3 + 0.25 * field, -1, 1).astype(np.float32)
        noise = rng.normal(size=(64, 64)).astype(np.float32)
        lst = (295.0 - 8.0 * field[::4, ::4] + 0.5 * noise).astype(np.float32)
        lst_list.append(lst)
        ndvi_list.append(ndvi)

    lst, ndvi = normalize(np.stack(lst_list), np.stack(ndvi_list), stats, "norm")
    return ArrayDataset(lst, ndvi, stats)


class StreamingModisDataset:
    """Out-of-core manifest dataset: per-batch decode through the native
    thread pool with background prefetch.

    ModisDataset materialises every patch at construction — right for the
    reference-sized corpora (a few GB), wrong for production-scale training
    where the manifest exceeds host RAM. This variant keeps only the path
    lists and decodes each shuffled batch on demand in the native loader's
    pthread pool (native/sifsr_native.cpp), one batch ahead of the consumer
    on a background thread, so decode overlaps device compute.

    Same iteration contract as ArrayDataset.batches (shuffled per seed,
    drop_remainder, {'lst','ndvi'} NHWC dicts) — drop-in for train.loop.
    """

    def __init__(self, csv_path: str, stats, split: str = "Train",
                 time: str = "Both", transf: str = "norm",
                 n_threads: int = 8, prefetch: int = 2):
        import csv as csv_mod

        self.lst_paths: list[str] = []
        self.ndvi_paths: list[str] = []
        with open(csv_path, newline="") as f:
            for row in csv_mod.DictReader(f):
                if row.get("split") != split:
                    continue
                if time != "Both" and time not in row["LST"]:
                    continue
                self.lst_paths.append(row["LST"])
                self.ndvi_paths.append(row["NDVI"])
        self.stats = stats
        self.transf = transf
        self.n_threads = n_threads
        self.prefetch = max(1, prefetch)

    def __len__(self) -> int:
        return len(self.lst_paths)

    def n_batches(self, batch_size: int, drop_remainder: bool = True) -> int:
        if drop_remainder:
            return len(self) // batch_size
        return -(-len(self) // batch_size)

    def _decode(self, idx: np.ndarray) -> dict:
        from sifsr_tpu.data.native_loader import load_batch, native_available

        lp = [self.lst_paths[i] for i in idx]
        np_ = [self.ndvi_paths[i] for i in idx]
        if native_available():
            lst = load_batch(lp, 64, 64, n_threads=self.n_threads)
            ndvi = load_batch(np_, 256, 256, n_threads=self.n_threads)
        else:
            lst = np.stack([read_geotiff(p).array for p in lp])
            ndvi = np.stack([read_geotiff(p).array for p in np_])
        lst, ndvi = normalize(lst.astype(np.float32), ndvi.astype(np.float32),
                              self.stats, self.transf)
        return {"lst": lst[..., None], "ndvi": ndvi[..., None]}

    def batches(self, batch_size: int, seed: int | None = None,
                drop_remainder: bool = True):
        import queue
        import threading

        order = np.arange(len(self))
        if seed is not None:
            np.random.default_rng(seed).shuffle(order)
        stop = len(self) - batch_size + 1 if drop_remainder else len(self)
        starts = list(range(0, max(stop, 0), batch_size))

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop_event = threading.Event()

        def put(item) -> bool:
            """Bounded put that gives up when the consumer is gone."""
            while not stop_event.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for s0 in starts:
                    if stop_event.is_set():
                        return
                    if not put(self._decode(order[s0 : s0 + batch_size])):
                        return
            except Exception as exc:  # surface decode errors to the consumer
                put(exc)
            put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            # consumer abandoned the epoch (break / exception / close):
            # unblock and retire the producer instead of leaking it pinned
            # on a full queue (one leaked daemon thread + decoded batches
            # per abandoned epoch otherwise)
            stop_event.set()
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5.0)
