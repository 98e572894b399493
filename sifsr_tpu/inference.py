"""Whole-granule tiled SR inference — the framework's serving hot path.

The reference predicts a 1200x1200 LST granule block-by-block at batch size 1
on the host (predict.py:84-103: ~324 sequential forward passes with per-block
cv2 upsampling and numpy scatter). Here the granule is processed as a handful
of large batched device steps:

1. host: tile the granule into 64x64 LST / 256x256 NDVI blocks (one reshape);
2. device, one jit: normalise -> bicubic x4 (matmul) -> U-Net forward ->
   de-normalise, over a whole batch of blocks at once;
3. host: scatter the SR blocks back into the 4800x4800 mosaic (one reshape).

Block-validity semantics: the reference's cloud/sea skip condition
(predict.py:95, sum(lst==0) <= 64²) is vacuously true, so it SR-processes
every full block; ``coverage`` reproduces that by default (1.0) but a real
threshold (e.g. 0.05 = skip blocks with >5% invalid pixels) is available.
Invalid blocks still run through the batch (static shapes) — their output is
masked out of the mosaic, so there is no data-dependent shape anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sifsr_tpu.data.statistics import Statistics
from sifsr_tpu.models.unet import ModelB2
from sifsr_tpu.ops.resize import upsample_bicubic

__all__ = ["tile_granule", "untile_mosaic", "make_sr_step", "predict_granule",
           "probe_link", "choose_granule_mode"]


def tile_granule(lst: np.ndarray, ndvi: np.ndarray, window: int = 64, factor: int = 4):
    """(H, W) LST + (fH, fW) NDVI -> (N, window, window), (N, f·window, f·window).

    Blocks are row-major; partial edge blocks are dropped (granules are exact
    multiples in practice: 1200/64 -> 18x18 = 324 usable blocks like the
    reference's loop)."""
    gh, gw = lst.shape[0] // window, lst.shape[1] // window
    lst = lst[: gh * window, : gw * window]
    fwin = window * factor
    ndvi = ndvi[: gh * fwin, : gw * fwin]
    lst_blocks = lst.reshape(gh, window, gw, window).transpose(0, 2, 1, 3).reshape(-1, window, window)
    ndvi_blocks = ndvi.reshape(gh, fwin, gw, fwin).transpose(0, 2, 1, 3).reshape(-1, fwin, fwin)
    return lst_blocks, ndvi_blocks, (gh, gw)


def untile_mosaic(blocks: np.ndarray, grid: tuple[int, int]) -> np.ndarray:
    """(N, fwin, fwin) row-major blocks -> (gh*fwin, gw*fwin) mosaic."""
    gh, gw = grid
    fwin = blocks.shape[-1]
    return (
        blocks.reshape(gh, gw, fwin, fwin).transpose(0, 2, 1, 3).reshape(gh * fwin, gw * fwin)
    )


@functools.lru_cache(maxsize=8)
def make_sr_step(
    model: ModelB2,
    stats: Statistics,
    compute_dtype=jnp.bfloat16,
    fuse_bn: bool = True,
    pad_impl: str = "fused",
):
    """Build the jitted batched SR step:
    (variables, lst_blocks (N,64,64), ndvi_blocks (N,256,256)) -> (N,256,256) K.

    The whole per-block pipeline of the reference (normalise, cv2 bicubic x4,
    torch forward, de-normalise; predict.py:96-103) is one XLA program. The
    U-Net runs in ``compute_dtype`` (bf16 by default — the MXU's native
    precision; SR output error vs f32 is ~0.01 K, far below sensor noise) with
    DEFAULT matmul precision (single-pass MXU issue); normalisation and the
    resampling matmuls stay in f32. Pass compute_dtype=jnp.float32 for a
    full-precision serving path (uses HIGHEST accumulation).

    fuse_bn=True folds BatchNorm into the conv weights on the fly (profiling
    showed BN+ReLU elementwise fusions costing ~40% of the eval forward on
    v5e; see models.fused). The returned step then expects *standard* ModelB2
    variables and folds them inside the jit (folding is a few k FLOPs).

    pad_impl='fused' (default, BN-folded path only) runs the replicate-pad
    convs without materialising padded inputs (models.unet.Conv3x3) — the
    same HBM-traffic saving measured at +49% on training also applies to
    the forward-only serving step; border pixels differ from 'explicit' by
    ~1 ulp of summation order, far below the bf16 rounding already accepted
    on this path. Pass pad_impl='explicit' for the bit-exact pad semantics
    (the fuse_bn=False reference path is always explicit).
    """
    import jax.lax as lax

    from sifsr_tpu.models.fused import InferenceModelB2, fold_batchnorm

    precision = lax.Precision.DEFAULT if compute_dtype == jnp.bfloat16 else lax.Precision.HIGHEST
    if fuse_bn:
        serve_model = InferenceModelB2(
            in_channels=model.in_channels,
            downchannels=tuple(model.downchannels),
            padding_mode=model.padding_mode,
            precision=precision,
            pad_impl=pad_impl,
        )
        apply_fn = lambda v, x: serve_model.apply(v, x)
    else:
        serve_model = model.clone(precision=precision)
        apply_fn = lambda v, x: serve_model.apply(v, x, train=False)

    @jax.jit
    def sr_step(variables, lst_blocks, ndvi_blocks):
        if fuse_bn and "batch_stats" in variables:
            variables = fold_batchnorm(variables)
        lst_n = (lst_blocks - stats.mean_lst) / stats.std_lst
        ndvi_n = (ndvi_blocks - stats.mean_ndvi) / stats.std_ndvi
        lst_up = upsample_bicubic(lst_n, 4)
        x = jnp.stack([lst_up, ndvi_n], axis=-1).astype(compute_dtype)
        cast_vars = jax.tree.map(lambda a: a.astype(compute_dtype), variables)
        sr = apply_fn(cast_vars, x)[..., 0]
        return sr.astype(jnp.float32) * stats.std_lst + stats.mean_lst

    return sr_step


# integer wire formats for the host<->device link (predict_granule wire="int"):
# MODIS-native quantisation steps, so encoding real granules is LOSSLESS
# (MOD21/MOD11 LST is uint16 at 0.02 K; MODIS NDVI products are int16 at 1e-4)
WIRE_LST_STEP = 0.02   # K per LSB, uint16
WIRE_NDVI_STEP = 1e-4  # per LSB, int16


def encode_wire(lst: np.ndarray, ndvi: np.ndarray):
    """f32 Kelvin / NDVI -> (uint16, int16) wire arrays (2 bytes/px)."""
    lst_w = np.clip(np.round(lst / WIRE_LST_STEP), 0, 65535).astype(np.uint16)
    ndvi_w = np.clip(np.round(ndvi / WIRE_NDVI_STEP),
                     -32768, 32767).astype(np.int16)
    return lst_w, ndvi_w


def _wire_step(sr_step):
    """Wrap a serving step with on-device wire decode/encode: inputs arrive
    as uint16/int16, the SR mosaic leaves as uint16 Kelvin/0.02 — halving
    every transfer on the host<->device link."""
    @jax.jit
    def step(params, lst_w, ndvi_w):
        lst = lst_w.astype(jnp.float32) * WIRE_LST_STEP
        ndvi = ndvi_w.astype(jnp.float32) * WIRE_NDVI_STEP
        sr = sr_step(params, lst, ndvi)
        return jnp.clip(jnp.round(sr / WIRE_LST_STEP),
                        0, 65535).astype(jnp.uint16)

    return step


@functools.lru_cache(maxsize=8)
def _device_tiling_fn(sr_step, window: int, factor: int, gh: int, gw: int,
                      bs: int, coverage: float, wire: bool = False):
    """Jitted all-on-device granule program for predict_granule's
    device_tiling mode, cached per (sr_step, geometry) so repeated granules
    of the same shape reuse the compiled executable."""
    fwin = window * factor
    nt = gh * gw
    k = -(-nt // bs)
    pad = k * bs - nt
    if wire:
        sr_step = _wire_step(sr_step)

    @jax.jit
    def run_device(lst_g, ndvi_g, params):
        lst_t = (lst_g[: gh * window, : gw * window]
                 .reshape(gh, window, gw, window)
                 .transpose(0, 2, 1, 3).reshape(nt, window, window))
        ndvi_t = (ndvi_g[: gh * fwin, : gw * fwin]
                  .reshape(gh, fwin, gw, fwin)
                  .transpose(0, 2, 1, 3).reshape(nt, fwin, fwin))
        keep = (lst_t == 0).mean(axis=(1, 2),
                                 dtype=jnp.float32) <= coverage
        if pad:
            lst_t = jnp.concatenate(
                [lst_t, jnp.zeros((pad, window, window), lst_t.dtype)])
            ndvi_t = jnp.concatenate(
                [ndvi_t, jnp.zeros((pad, fwin, fwin), ndvi_t.dtype)])
        sr = jax.lax.map(
            lambda ab: sr_step(params, ab[0], ab[1]),
            (lst_t.reshape(k, bs, window, window),
             ndvi_t.reshape(k, bs, fwin, fwin)))
        sr = sr.reshape(k * bs, fwin, fwin)[:nt]
        sr = jnp.where(keep[:, None, None], sr, jnp.zeros((), sr.dtype))
        return (sr.reshape(gh, gw, fwin, fwin)
                .transpose(0, 2, 1, 3).reshape(gh * fwin, gw * fwin))

    return run_device


_LINK_PROBE_CACHE: dict = {}


def probe_link(refresh: bool = False, bulk_mb: int = 32):
    """Measure the host<->device link once: dispatch round-trip latency and
    bulk h2d/d2h bandwidth. Cached per process (granule serving calls this
    once, not per granule).

    Returns {"rtt_s", "h2d_bytes_per_s", "d2h_bytes_per_s"}.
    """
    if _LINK_PROBE_CACHE and not refresh:
        return _LINK_PROBE_CACHE
    tiny = np.zeros((8,), np.float32)
    float(jax.device_put(tiny).sum())  # warm the dispatch path
    rtt = min(
        _timed(lambda: float(jax.device_put(tiny).sum())) for _ in range(3))
    buf = np.zeros((bulk_mb * 1024 * 1024 // 4,), np.float32)
    float(jax.device_put(buf).sum())  # warm transfer buffers / compile sum
    up = _timed(lambda: float(jax.device_put(buf).sum()))
    dev_buf = jax.device_put(buf) + 0.0
    float(dev_buf[0])  # ensure materialised
    down = _timed(lambda: np.asarray(dev_buf))
    _LINK_PROBE_CACHE.update(
        rtt_s=rtt,
        h2d_bytes_per_s=buf.nbytes / max(up - rtt, 1e-9),
        d2h_bytes_per_s=buf.nbytes / max(down, 1e-9),
    )
    return _LINK_PROBE_CACHE


def _timed(fn):
    import time

    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


# rough per-patch device compute estimate for the mode decision only
# (the pallas/bf16 serving paths land between 5.7k and 10k patches/s on v5e;
# the decision is insensitive to this within an order of magnitude because
# the two regimes it separates differ by ~100x in link bandwidth)
_EST_PATCHES_PER_S = 8000.0
# host-side tile/scatter memcpy rate estimate (single-thread numpy reshape
# + transpose of the granule, measured ~4 GB/s on this class of host)
_EST_HOST_BYTES_PER_S = 4e9


def choose_granule_mode(lst_shape, window: int, factor: int, batch_size: int,
                        link=None) -> dict:
    """Pick host_pipeline vs device_tiling(+wire) from a link probe.

    The measured breakdown (FUTURE.md, round 4): device_tiling's wall is
    STRICTLY upload + compute + download (one fused program, two bulk
    transfers), while the host pipeline overlaps per-batch upload/compute/
    download triples, so its wall approaches the pure link time — but it
    pays 2·n_batches dispatch round-trips and does the tile/scatter memcpy
    on the host. Bandwidth-bound link (this harness's tunnel) -> pipeline;
    dispatch-latency-bound link (a real PCIe host) -> device_tiling.
    """
    link = link or probe_link()
    gh, gw = lst_shape[0] // window, lst_shape[1] // window
    n = gh * gw
    n_batches = -(-n // batch_size)
    fwin = window * factor
    up = 4 * (gh * gw * window * window) * (1 + factor * factor)
    down = 4 * (gh * gw * fwin * fwin)
    t_up = up / link["h2d_bytes_per_s"]
    t_down = down / link["d2h_bytes_per_s"]
    t_compute = n / _EST_PATCHES_PER_S
    t_host = (up + down) / _EST_HOST_BYTES_PER_S
    # device_tiling: one fused program — upload, compute and download are
    # STRICTLY serialized (the r4 measured breakdown), plus 2 dispatches
    t_dt = t_up + t_down + t_compute + 2 * link["rtt_s"]
    # host pipeline: the per-batch upload/compute/download triples overlap,
    # so the steady state is bounded by the slowest stream (uploads and
    # downloads ride opposite link directions); the pipeline fill/drain
    # skew costs ~one batch of each transfer, and the host pays the
    # tile/scatter memcpy plus one dispatch rtt per batch
    t_hp = (max(t_up, t_down, t_compute)
            + (t_up + t_down) / max(n_batches, 1)
            + t_host + n_batches * link["rtt_s"])
    # Tie-break in favour of the pipeline: the two regimes this decision
    # separates differ by ~100x in link bandwidth, so a genuine
    # device_tiling link predicts a LARGE win. Predictions within 25% are
    # model-error territory (bench r5 observed the probe's burst bandwidth
    # overestimating the sustained tunnel rate ~4x, flipping a ~5%
    # predicted win into a measured 15% loss), and the pipeline degrades
    # gracefully (wall ~ max(transfer, compute)) while device_tiling's is
    # a strict sum.
    decision = {
        "mode": "device_tiling" if t_dt < 0.75 * t_hp else "host_pipeline",
        "t_device_tiling_s": round(t_dt, 4),
        "t_host_pipeline_s": round(t_hp, 4),
        "rtt_s": round(link["rtt_s"], 5),
        "h2d_mb_s": round(link["h2d_bytes_per_s"] / 1e6, 1),
        "d2h_mb_s": round(link["d2h_bytes_per_s"] / 1e6, 1),
    }
    return decision


def predict_granule(
    variables,
    lst_granule: np.ndarray,
    ndvi_granule: np.ndarray,
    stats: Statistics,
    model: ModelB2 | None = None,
    batch_size: int = 324,
    coverage: float = 1.0,
    compute_dtype=jnp.bfloat16,
    ndvi_clip: bool = True,
    overlap: int = 0,
    window: int = 64,
    factor: int = 4,
    mesh=None,
    sr_step=None,
    step_params=None,
    pipeline_depth: int = 3,
    device_tiling: bool = False,
    wire: str | None = None,
    pad_impl: str = "fused",
    mode: str | None = None,
) -> np.ndarray:
    """SR a whole granule; returns the (factor·H, factor·W) Kelvin mosaic.

    coverage: max allowed fraction of invalid (0 K) pixels per block before a
    block is zeroed in the output. 1.0 reproduces the reference's behaviour
    (its skip test is vacuous, predict.py:95).

    overlap (coarse pixels, 0 = reference behaviour): with overlap > 0, tiles
    are taken at stride window-overlap and blended with a separable trapezoid
    taper — removes the visible block seams the reference accepts
    (SURVEY.md §5 'spatial tiling'). Costs ~(window/(window-overlap))² more
    compute.

    mesh: a jax.sharding.Mesh with a 'data' axis shards every SR batch across
    its devices (variables replicated; XLA partitions the forward — granule
    tiles are embarrassingly parallel). batch_size should be a multiple of
    the mesh size.

    sr_step/step_params: serving-step override, e.g. the int8 or pallas fast
    paths (models/quantized, models/pallas_serving); called as
    sr_step(step_params, lst_batch, ndvi_batch).

    The batch loop is double-buffered (pipeline_depth batches in flight):
    JAX dispatch is asynchronous, so host tile upload + mosaic scatter of
    batch i overlap device compute of batches i+1..i+depth — the whole-
    granule wall stays close to the device-only throughput (vs the
    reference's fully synchronous 324 batch-1 round trips, predict.py:84-103).

    device_tiling (overlap == 0 only): tile extraction, batching and mosaic
    assembly all run ON DEVICE inside one jit — the granule is uploaded once
    and the mosaic downloaded once (two bulk transfers instead of
    2·n_batches round trips). The right choice whenever the host<->device
    link is the bottleneck; the host pipeline remains for mesh sharding,
    overlap blending, and granules larger than device memory.

    wire="int" ships LST as uint16 (0.02 K/LSB — the MODIS-native encoding,
    so real granules encode LOSSLESSLY), NDVI as int16 (1e-4/LSB, ditto)
    and the SR mosaic back as uint16 Kelvin/0.02: every host<->device
    transfer halves. Decode/encode run on device inside the jit. Output
    error vs wire=None is bounded by the 0.01 K output rounding plus the
    model's response to <=5e-5 NDVI rounding — far below the ~2 K sensor
    accuracy (and zero for inputs that came from real MODIS files).
    Not combined with mesh (the sharded wrapper device_puts f32 batches).

    pad_impl: conv padding implementation for the default (bf16/f32
    BN-folded) step — 'fused' (default, +12% device throughput) or
    'explicit' (the reference's materialised pads); see
    inference.make_sr_step. Ignored when sr_step is supplied.

    mode: high-level mode selector overriding device_tiling/wire:
    'host_pipeline', 'device_tiling', 'device_tiling_wire', or 'auto'.
    'auto' probes the host<->device link once per process (one dispatch
    round-trip + one bulk transfer, probe_link) and picks the mode the
    measured link regime favours (choose_granule_mode): a bandwidth-bound
    link (e.g. this harness's tunnel) -> overlapped host pipeline; a
    dispatch-latency-bound link (a real PCIe host) -> device_tiling. The
    decision is logged to stderr. wire stays an explicit knob (its win
    depends on the link's 16-bit-path rate, which the probe does not
    measure); combine as mode='auto', wire='int' if the link is known
    MODIS-lossless-friendly.
    """
    if mode is not None:
        if mode == "auto":
            decision = choose_granule_mode(lst_granule.shape, window, factor,
                                           batch_size)
            device_tiling = decision["mode"] == "device_tiling"
            import sys as _sys

            print(f"predict_granule auto mode: {decision}", file=_sys.stderr)
        elif mode == "host_pipeline":
            device_tiling = False
        elif mode == "device_tiling":
            device_tiling = True
        elif mode == "device_tiling_wire":
            device_tiling, wire = True, "int"
        else:
            raise ValueError(
                f"mode must be host_pipeline/device_tiling/"
                f"device_tiling_wire/auto, got {mode!r}")
    if ndvi_clip:
        ndvi_granule = np.clip(ndvi_granule, -1.0, 1.0)  # predict.py:88-89
    fwin = window * factor
    if sr_step is None:
        model = model or ModelB2()
        sr_step = make_sr_step(model, stats, compute_dtype, pad_impl=pad_impl)
        step_params = variables

    if wire not in (None, "int"):
        raise ValueError(f"wire must be None or 'int', got {wire!r}")
    if wire == "int":
        if mesh is not None:
            raise ValueError("wire='int' is a single-device transfer "
                             "optimisation; use wire=None with mesh")
        lst_granule, ndvi_granule = encode_wire(lst_granule, ndvi_granule)
        base_wire_step = sr_step
        decode_out = lambda a: np.asarray(a, np.float32) * WIRE_LST_STEP
    else:
        decode_out = np.asarray

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data_shard = NamedSharding(mesh, P("data"))
        step_params = jax.tree.map(lambda a: jax.device_put(a, repl), step_params)
        base_step = sr_step

        def sr_step(v, lst_b, ndvi_b):  # noqa: F811 — sharded wrapper
            lst_b = jax.device_put(lst_b, data_shard)
            ndvi_b = jax.device_put(ndvi_b, data_shard)
            return base_step(v, lst_b, ndvi_b)

    def run_batches(lst_blocks, ndvi_blocks, n, consume):
        """Dispatch every batch asynchronously, keeping pipeline_depth in
        flight; consume(start, stop, sr_numpy) drains completed batches on
        the host while later batches compute on device."""
        from collections import deque

        pending: deque = deque()
        batch_step = _wire_step(base_wire_step) if wire == "int" else sr_step

        def drain():
            s0, s1, dev = pending.popleft()
            consume(s0, s1, decode_out(dev))

        for start in range(0, n, batch_size):
            stop = min(start + batch_size, n)
            pad = batch_size - (stop - start)
            lst_b = lst_blocks[start:stop]
            ndvi_b = ndvi_blocks[start:stop]
            if pad:  # static shapes: pad the tail batch
                lst_b = np.concatenate([lst_b, np.zeros((pad, window, window), lst_b.dtype)])
                ndvi_b = np.concatenate([ndvi_b, np.zeros((pad, fwin, fwin), ndvi_b.dtype)])
            pending.append(
                (start, stop, batch_step(step_params, jnp.asarray(lst_b), jnp.asarray(ndvi_b)))
            )
            if len(pending) >= max(pipeline_depth, 1):
                drain()
        while pending:
            drain()

    if device_tiling:
        if mesh is not None:
            raise ValueError(
                "device_tiling currently targets single-device serving; "
                "use the host pipeline (device_tiling=False) with mesh")
        if overlap != 0:
            raise ValueError(
                "device_tiling does not implement overlap blending; "
                "use the host pipeline (device_tiling=False) with overlap")
        gh = lst_granule.shape[0] // window
        gw = lst_granule.shape[1] // window
        run_device = _device_tiling_fn(sr_step, window, factor, gh, gw,
                                       min(batch_size, gh * gw), coverage,
                                       wire=(wire == "int"))
        return decode_out(run_device(jnp.asarray(lst_granule),
                                     jnp.asarray(ndvi_granule), step_params))

    if overlap == 0:
        lst_blocks, ndvi_blocks, grid = tile_granule(lst_granule, ndvi_granule, window, factor)
        n = lst_blocks.shape[0]
        invalid_frac = (lst_blocks == 0.0).mean(axis=(1, 2))
        keep = invalid_frac <= coverage

        out = np.zeros((n, fwin, fwin), dtype=np.float32)

        def consume(start, stop, sr):
            out[start:stop] = sr[: stop - start]

        run_batches(lst_blocks, ndvi_blocks, n, consume)
        out[~keep] = 0.0
        return untile_mosaic(out, grid)

    # ---- overlapped tiles with trapezoid blending
    stride = window - overlap
    gh = lst_granule.shape[0] // window
    gw = lst_granule.shape[1] // window
    h_lim, w_lim = gh * window, gw * window
    origins = []
    ys = list(range(0, h_lim - window + 1, stride))
    if ys[-1] != h_lim - window:
        ys.append(h_lim - window)
    xs = list(range(0, w_lim - window + 1, stride))
    if xs[-1] != w_lim - window:
        xs.append(w_lim - window)
    for y in ys:
        for x in xs:
            origins.append((y, x))

    lst_blocks = np.stack([lst_granule[y : y + window, x : x + window] for y, x in origins])
    ndvi_blocks = np.stack(
        [ndvi_granule[factor * y : factor * (y + window), factor * x : factor * (x + window)]
         for y, x in origins]
    )
    invalid_frac = (lst_blocks == 0.0).mean(axis=(1, 2))
    keep = invalid_frac <= coverage

    ramp = overlap * factor
    taper_1d = np.ones(fwin, np.float32)
    if ramp > 0:
        taper_1d[:ramp] = np.linspace(1.0 / (ramp + 1), 1.0, ramp, endpoint=False)
        taper_1d[-ramp:] = taper_1d[:ramp][::-1]
    taper = np.outer(taper_1d, taper_1d)

    acc = np.zeros((h_lim * factor, w_lim * factor), np.float64)
    wacc = np.zeros_like(acc)
    n = len(origins)

    def consume(start, stop, sr):
        for k in range(stop - start):
            if not keep[start + k]:
                continue
            y, x = origins[start + k]
            sl = np.s_[factor * y : factor * y + fwin, factor * x : factor * x + fwin]
            acc[sl] += sr[k] * taper
            wacc[sl] += taper

    run_batches(lst_blocks, ndvi_blocks, n, consume)
    out = np.where(wacc > 0, acc / np.maximum(wacc, 1e-12), 0.0)
    return out.astype(np.float32)
