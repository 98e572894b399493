#!/usr/bin/env python3
"""Headline benchmark: 64->256 SR patches/sec/chip through the full serving
step (normalise + bicubic x4 + ModelB U-Net forward + de-normalise).

Prints the JSON result line REPEATEDLY — once after every completed
milestone — so the record survives a wall-clock kill at any point (the
driver parses the tail of stdout; the last line is the most complete).
Final shape:
  {"metric": "sr_patches_per_sec_per_chip", "value": N, "unit": "patches/s",
   "vs_baseline": N / 10000, "paths": {...}, "granule": {...},
   "train_samples_per_sec": {...}, ...}

Robustness (BENCH_r04 was rc=124/parsed=null — the driver's hard wall
landed before the single end-of-run print):
  * All measurement runs in a WORKER thread; the MAIN thread is a watchdog
    that emits whatever has been measured and exits at SIFSR_BENCH_WALL_S
    (default 1050 s) even if the worker is stuck inside a blocked tunnel
    call that Python signal handlers could not interrupt.
  * SIGTERM/SIGINT handlers (delivered to the sleeping main thread) emit
    the current result before exiting, so a driver `timeout` kill still
    yields a parsed record.
  * Stage order is reporting priority: the pallas headline first (cache-
    warm it lands ~2 min after device contact; device contact itself can
    eat 15+ min under congestion, so the stage that defines the record
    owns the first slot), then the bf16 XLA path (serve-daemon default /
    cold-cache insurance), the fused training row, the comparison serving
    paths, the remaining training rows, and the granule modes last (a
    cold full-granule compile can wedge >40 min under congestion; it emits
    after every mode so partial measurements still land). Every stage
    emits on completion and is individually skippable once the soft
    deadline passes, so a congested tunnel truncates the report from the
    least important end.
  * A persistent XLA compilation cache (.jax_compile_cache/, verified to
    hit cross-process through the axon tunnel) is pre-warmed by running
    bench.py after any graph-touching change, so the driver's run
    recompiles nothing.

Baseline: the BASELINE.json north-star of 10k patches/sec/chip on TPU v5e
(the reference itself runs batch-1 on CPU/GPU with per-block host
round-trips; see BASELINE.md). Serving MFU is derived from the counted
conv FLOPs of one 64->256 patch (3.605 GFLOP, utils/flops.py — the bilinear
UpBlock mid=in//2 channel plan) against the v5e int8 peak (394 TOPS).
Training MFU uses XLA's own cost analysis of the exact step being measured
(per dtype/pad_impl), falling back to the legacy f32-b8 count only if cost
analysis is unavailable.

Serving paths raced (failures are isolated per path):
  bf16        — BN-folded bf16 XLA graph with fused replicate pads (the
                serve-daemon default path; also the insurance number);
  pallas_full — the full-pallas int8 U-Net, mid='prow'
                (models/pallas_serving.py) — the headline path;
  pallas_i8   — pallas front/tail + XLA int8 mid chain;
  int8_static — static-calibrated int8 XLA convs (models/quantized.py).

Training throughput is measured on synthetic data through the full jitted
step (fwd + sensor-model ds-loss + Sobel percep loss + bwd + Adam):
  f32_b32  — reference-parity config (HIGHEST precision, batch 32);
  bf16_b128 — mixed-precision config (bf16 compute, f32 master weights);
  bf16_b256_fused — + fused replicate-pad convs (the round-4+ fast path).
"""

import json
import os
import signal
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compilation cache: compiles through the axon tunnel cost
# 3 s..10 min *each* depending on congestion (BENCH_r04 died to exactly
# that), but cache HITS are verified to work across processes on this
# backend (33.6 s cold -> 3.7 s warm on a probe graph). The cache is
# pre-warmed by running bench.py once after any serving/training-step
# change, so the driver's wall-clocked run recompiles nothing.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".jax_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

# counted per-patch conv FLOPs (sifsr_tpu.utils.flops.modelb2_conv_flops —
# a programmatic walk of the ModelB2 channel plan, regression-tested in
# tests/test_flops.py)
from sifsr_tpu.utils.flops import modelb2_conv_flops

PATCH_FLOPS = modelb2_conv_flops()          # 3.605e9
V5E_INT8_PEAK = 394e12
V5E_BF16_PEAK = 197e12
# legacy fallback only (XLA cost analysis of the f32 batch-8 step); the
# bench measures the real per-config number at run time via cost_analysis
TRAIN_FLOPS_FALLBACK = 12.21e9

_T0 = time.perf_counter()
# hard wall: the watchdog emits + exits at this point no matter what the
# worker is doing. Set ABOVE any plausible driver wall: the driver's own
# `timeout` SIGTERM is caught and flushed (observed r4 rc=124 = SIGTERM),
# so bench should keep measuring for as long as it is allowed to — a
# congested tunnel can spend 15+ min on first device contact alone, and a
# short internal wall was observed to cut the warm-cache headline stage
# right after the insurance number landed.
_WALL_S = float(os.environ.get("SIFSR_BENCH_WALL_S", "3000"))
# soft deadline for optional stages (comparison paths / granule / training)
_DEADLINE_S = float(os.environ.get("SIFSR_BENCH_DEADLINE_S",
                                   str(0.72 * _WALL_S)))

_LOCK = threading.Lock()
RESULT = {
    "metric": "sr_patches_per_sec_per_chip",
    "value": 0.0,
    "unit": "patches/s",
    "vs_baseline": 0.0,
    "batch": None,
    "path": "",
    "paths": {},
    "granule": None,
    "mfu_int8": None,
    "train_samples_per_sec": {},
    "train_flops_per_sample": {},
    "train_mfu_bf16": None,
    "train_mfu_bf16_fused": None,
    "stages_done": [],
    "device": None,
}


def emit(stage, lock_timeout=5.0):
    """Print the current result line (the driver parses the LAST line).

    Bounded lock wait: if the worker is wedged mid-update, the watchdog /
    signal path still emits a best-effort snapshot instead of deadlocking.
    """
    got = _LOCK.acquire(timeout=lock_timeout)
    try:
        RESULT["elapsed_s"] = round(time.perf_counter() - _T0, 1)
        line = json.dumps(RESULT)
    finally:
        if got:
            _LOCK.release()
    print(line, flush=True)
    print(f"bench: emitted after {stage!r} at t+{time.perf_counter() - _T0:.0f}s",
          file=sys.stderr)


def record_serving(name, value, batch, stage_tag=None):
    with _LOCK:
        RESULT["paths"][name] = value
        RESULT["stages_done"].append(stage_tag or f"serving:{name}")
        if value > RESULT["value"]:
            RESULT["value"] = value
            RESULT["path"] = name
            RESULT["batch"] = batch
            RESULT["vs_baseline"] = round(value / 10000.0, 3)
            RESULT["mfu_int8"] = round(value * PATCH_FLOPS / V5E_INT8_PEAK, 4)
    emit(name)


def _skip(stage):
    """True (and log) if the soft deadline has passed for an optional stage."""
    elapsed = time.perf_counter() - _T0
    if elapsed > _DEADLINE_S:
        print(f"bench: skipping optional stage {stage!r} "
              f"({elapsed:.0f}s elapsed > {_DEADLINE_S:.0f}s deadline)",
              file=sys.stderr)
        return True
    return False


def _measure(fn, lst, ndvi, iters=10, repeats=3):
    """Time `iters` dependency-chained serving steps inside ONE jitted scan:
    per-call dispatch through the axon tunnel costs ~5-10 ms and its
    block_until_ready is a no-op, so a Python-loop measurement is dominated
    by host round-trips at small batches; the scan keeps the chain on
    device and the trailing float() is the only sync. The chain is timed
    `repeats` times and the fastest is reported: the device time is
    deterministic, so the min strips tunnel/host scheduling noise."""
    from jax import lax

    @jax.jit
    def run(l, nd):
        def body(carry, _):
            out = fn(carry, nd)
            return carry + 0.0 * out[:, : carry.shape[1], : carry.shape[2]], out.mean()

        return lax.scan(body, l, None, length=iters)

    float(run(lst, ndvi)[1].sum())  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(lst, ndvi)[1].sum())
        best = min(best, time.perf_counter() - t0)
    return best, iters


def _serving_inputs(rng, batch):
    lst = jnp.asarray(290.0 + 5.0 * rng.random((batch, 64, 64)), dtype=jnp.float32)
    ndvi = jnp.asarray(rng.random((batch, 256, 256)) * 0.8, dtype=jnp.float32)
    return lst, ndvi


def bench_serving_core():
    """Insurance bf16 number + the pallas headline. Returns the shared
    context (stats/variables/calibration/pallas params) the later optional
    stages reuse."""
    from sifsr_tpu.data.statistics import Statistics
    from sifsr_tpu.models.unet import ModelB2

    model = ModelB2()
    stats = Statistics(maxi=330.0, mini=260.0, mean_lst=295.0, std_lst=10.0,
                       mean_ndvi=0.3, std_ndvi=0.25)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 2)), train=False)
    rng = np.random.default_rng(1)

    # --- the headline pallas path FIRST: with the pre-warmed compile cache
    # it lands ~2 min after device contact, and contact itself can eat
    # 15+ min of a congested session — the one stage the record can't do
    # without must own the first slot. (On a cold cache the bf16 stage
    # below still lands an insurance number if this one is slow or fails.)
    cal_lst = (290.0 + 5.0 * rng.random((8, 64, 64))).astype(np.float32)
    cal_ndvi = (rng.random((8, 256, 256)) * 0.8).astype(np.float32)
    pallas_params = None
    try:
        from sifsr_tpu.models.pallas_serving import (
            build_pallas_serving_params, make_pallas_sr_step)

        pallas_params = build_pallas_serving_params(variables, cal_lst, cal_ndvi, stats)
        # measured best batch: 384 > 256 > 512 (dispatch amortisation vs the
        # kernels' per-image ib blocking)
        lst, ndvi = _serving_inputs(rng, 384)
        step = make_pallas_sr_step(stats, mid="prow")
        # headline gets extra repeats: the min of a deterministic device
        # chain only sheds tunnel/host noise with enough draws
        dt, iters = _measure(lambda l, n: step(pallas_params, l, n), lst, ndvi,
                             iters=50, repeats=5)
        record_serving("pallas_full", round(384 * iters / dt, 1), 384)
    except Exception as exc:  # pragma: no cover
        print(f"pallas_full failed: {exc}", file=sys.stderr)

    # --- the bf16 XLA path (serve-daemon default; also the insurance
    # number when the pallas path is cold or broken) ---
    try:
        from sifsr_tpu.inference import make_sr_step

        sr_bf16 = make_sr_step(model, stats, jnp.bfloat16, True)
        lst, ndvi = _serving_inputs(rng, 256)
        dt, iters = _measure(lambda l, n: sr_bf16(variables, l, n), lst, ndvi,
                             iters=50, repeats=2)
        record_serving("bf16", round(256 * iters / dt, 1), 256)
    except Exception as exc:  # pragma: no cover
        print(f"bf16 path failed: {exc}", file=sys.stderr)
    return dict(stats=stats, variables=variables, rng=rng,
                cal_lst=cal_lst, cal_ndvi=cal_ndvi,
                pallas_params=pallas_params)


def bench_serving_rest(ctx):
    """Comparison serving paths (deadline-skippable)."""
    stats, variables, rng = ctx["stats"], ctx["variables"], ctx["rng"]
    cal_lst, cal_ndvi = ctx["cal_lst"], ctx["cal_ndvi"]
    pallas_params = ctx["pallas_params"]
    if pallas_params is not None and not _skip("serving path pallas_i8"):
        try:
            from sifsr_tpu.models.pallas_serving import make_pallas_sr_step

            lst, ndvi = _serving_inputs(rng, 256)
            step = make_pallas_sr_step(stats, mid="xla")
            dt, iters = _measure(lambda l, n: step(pallas_params, l, n),
                                 lst, ndvi, iters=50, repeats=3)
            record_serving("pallas_i8", round(256 * iters / dt, 1), 256)
        except Exception as exc:  # pragma: no cover
            print(f"pallas_i8 failed: {exc}", file=sys.stderr)

    if not _skip("serving path int8_static"):
        try:
            from sifsr_tpu.models.quantized import (
                calibrate_activation_scales, make_int8_sr_step,
                quantize_serving_params)

            qparams = calibrate_activation_scales(
                variables, quantize_serving_params(variables), cal_lst,
                cal_ndvi, stats)
            lst, ndvi = _serving_inputs(rng, 1024)
            step = make_int8_sr_step(stats)
            dt, iters = _measure(lambda l, n: step(qparams, l, n), lst, ndvi,
                                 iters=50, repeats=3)
            record_serving("int8_static", round(1024 * iters / dt, 1), 1024)
        except Exception as exc:  # pragma: no cover
            print(f"int8_static failed: {exc}", file=sys.stderr)


def bench_granule(ctx):
    """Whole-granule wall: the deployable number — host tile extraction +
    transfers + device SR + host mosaic scatter, double-buffered
    (inference.predict_granule), on a synthetic full 1200x1200 granule."""
    stats, rng = ctx["stats"], ctx["rng"]
    pallas_params = ctx["pallas_params"]
    if pallas_params is not None and not _skip("granule modes"):
        try:
            from sifsr_tpu.inference import predict_granule
            from sifsr_tpu.models.pallas_serving import make_pallas_sr_step

            with _LOCK:
                paths = dict(RESULT["paths"])
            best_mid = "prow" if paths.get("pallas_full", 0) >= paths.get(
                "pallas_i8", 0) else "xla"
            g_step = make_pallas_sr_step(stats, mid=best_mid)
            lst_g = (290.0 + 5.0 * rng.random((1200, 1200))).astype(np.float32)
            ndvi_g = (rng.random((4800, 4800)) * 0.8).astype(np.float32)
            kw = dict(stats=stats, batch_size=108, sr_step=g_step,
                      step_params=pallas_params)
            reps = 4
            modes = {}
            n_patches = (1200 // 64) * (1200 // 64)  # 324 blocks/granule
            for name, mkw in (("host_pipeline", {}),
                              ("auto", {"mode": "auto"}),
                              ("device_tiling", {"device_tiling": True}),
                              ("device_tiling_wire",
                               {"device_tiling": True, "wire": "int"})):
                # deadline-check EVERY mode (a cold device_tiling compile
                # through a congested tunnel was observed to wedge for
                # >40 min; the stage must not start one near the wall)
                if _skip(f"granule mode {name}"):
                    continue
                try:
                    predict_granule(None, lst_g, ndvi_g, **kw, **mkw)  # warm
                    best_rep = float("inf")
                    for _ in range(reps):
                        t0 = time.perf_counter()
                        predict_granule(None, lst_g, ndvi_g, **kw, **mkw)
                        best_rep = min(best_rep, time.perf_counter() - t0)
                    modes[name] = best_rep  # fastest rep: device time is
                    # deterministic, the min strips tunnel/host noise
                except Exception as exc:
                    # per-mode isolation: a transient tunnel/compile failure
                    # on one mode (r5 warm run: 'response body closed' from
                    # the remote-compile helper) must not lose the other
                    # modes' measurements
                    print(f"granule mode {name} failed: {exc}",
                          file=sys.stderr)
                    continue
                # emit after EVERY mode: a later mode wedging inside an
                # uninterruptible compile must not lose the measured ones
                mode = min(modes, key=modes.get)
                with _LOCK:
                    RESULT["granule"] = {
                        "patches_per_sec_wall": round(n_patches / modes[mode], 1),
                        "granule_seconds": round(modes[mode], 3),
                        "mid": best_mid,
                        "mode": mode,
                        "modes_seconds": {k: round(v, 3)
                                          for k, v in modes.items()},
                    }
                    if "granule" not in RESULT["stages_done"]:
                        RESULT["stages_done"].append("granule")
                emit(f"granule mode {name}")
            if not modes:
                return
            mode = min(modes, key=modes.get)
            dt = modes[mode] * reps

            # attribute the granule wall: the f32 modes ship ~90 MB up and
            # ~85 MB down per granule, so on this harness the number is
            # bound by the axon tunnel's host<->device link (~0.02 GB/s),
            # not by the pipeline (a real TPU host's PCIe moves the same
            # bytes ~500x faster, overlapped by the double buffering); the
            # wire mode halves every transfer (uint16/int16 — lossless for
            # MODIS-native data, inference.encode_wire).
            # block_until_ready is a no-op through the tunnel, so force the
            # upload to complete with a dependent scalar read per rep; the
            # probe is large (92 MB) to keep the sync round-trip <1% of dt.
            float(jax.device_put(ndvi_g).sum())  # warm the transfer path
            t0 = time.perf_counter()
            for _ in range(2):
                float(jax.device_put(ndvi_g).sum())
            h2d = 2 * ndvi_g.nbytes / (time.perf_counter() - t0) / 1e6
            with _LOCK:
                RESULT["granule"] = {
                    "patches_per_sec_wall": round(reps * n_patches / dt, 1),
                    "granule_seconds": round(dt / reps, 3),
                    "mid": best_mid,
                    "mode": mode,
                    "modes_seconds": {k: round(v, 3) for k, v in modes.items()},
                    "tunnel_host_to_device_mb_s": round(h2d, 1),
                }
                if "granule" not in RESULT["stages_done"]:
                    RESULT["stages_done"].append("granule")
            emit("granule")
        except Exception as exc:  # pragma: no cover
            print(f"granule bench failed: {exc}", file=sys.stderr)


TRAIN_ROWS = {
    # reporting priority order — the fused row is the one the verdict tracks
    "bf16_b256_fused": ("bfloat16", "DEFAULT", 256, "fused"),
    "bf16_b128": ("bfloat16", "DEFAULT", 128, "explicit"),
    "f32_b32": ("float32", "HIGHEST", 32, "explicit"),
}


def bench_training(rows):
    from sifsr_tpu.data import make_synthetic_dataset
    from sifsr_tpu.models.unet import ModelB2
    from sifsr_tpu.train.state import create_train_state
    from sifsr_tpu.train.step import make_train_step
    from jax import lax

    ds = make_synthetic_dataset(8, seed=0)
    from sifsr_tpu.data.datasets import prepare_batch

    raw = next(ds.batches(8, seed=0))

    for name in rows:
        dtype_s, prec_s, batch, pad_impl = TRAIN_ROWS[name]
        dtype = getattr(jnp, dtype_s)
        precision = getattr(lax.Precision, prec_s)
        if _skip(f"training row {name}"):
            continue
        try:
            model = ModelB2(dtype=dtype, precision=precision,
                            pad_impl=pad_impl)
            state = create_train_state(model, 1e-3, rng=jax.random.key(0),
                                       input_hw=(256, 256))
            step = make_train_step(model, "predef_filters", alpha=0.99, gamma=-0.5,
                                   mean_lst=295.0, std_lst=10.0, with_metrics=False)
            reps = -(-batch // raw["lst"].shape[0])
            batch_dict = prepare_batch({
                k: jnp.tile(jnp.asarray(v), (reps, 1, 1, 1))[:batch]
                for k, v in raw.items()
            })

            # AOT-compile so the SAME executable yields both the measured
            # run and XLA's cost analysis (the per-config MFU numerator —
            # the step graph differs by dtype/pad_impl, so a constant
            # silently drifts; ADVICE r4)
            flops_per_sample = None
            try:
                compiled = step.lower(state, batch_dict).compile()
                ca = compiled.cost_analysis()
                if isinstance(ca, list):
                    ca = ca[0]
                step_flops = float(ca.get("flops", 0.0))
                if step_flops > 0:
                    flops_per_sample = step_flops / batch
                run_step = compiled
            except Exception as exc:
                print(f"cost analysis unavailable for {name}: {exc}",
                      file=sys.stderr)
                run_step = step

            # measure with a persistent state chain so the optimizer update
            # runs (donated buffers chain through)
            state2, m = run_step(state, batch_dict)
            float(m["loss"])  # warm
            iters = 10
            t0 = time.perf_counter()
            s = state2
            last = None
            for _ in range(iters):
                s, m = run_step(s, batch_dict)
                last = m["loss"]
            float(last)
            dt = time.perf_counter() - t0
            sps = round(batch * iters / dt, 1)
            fps = flops_per_sample or TRAIN_FLOPS_FALLBACK
            with _LOCK:
                RESULT["train_samples_per_sec"][name] = sps
                RESULT["train_flops_per_sample"][name] = round(fps / 1e9, 3)
                if name == "bf16_b128":
                    RESULT["train_mfu_bf16"] = round(sps * fps / V5E_BF16_PEAK, 4)
                if name == "bf16_b256_fused":
                    RESULT["train_mfu_bf16_fused"] = round(
                        sps * fps / V5E_BF16_PEAK, 4)
                RESULT["stages_done"].append(f"train:{name}")
            emit(f"train:{name}")
        except Exception as exc:  # pragma: no cover
            print(f"train bench {name} failed: {exc}", file=sys.stderr)


def _worker():
    """Stage order = reporting priority: insurance + headline first, then
    the verdict-tracked training row, the granule modes, and only then the
    serving comparison rows and remaining training rows — so a congested
    tunnel truncates the report from the least important end."""
    try:
        with _LOCK:
            RESULT["device"] = str(jax.devices()[0])
        ctx = bench_serving_core()
        bench_training(["bf16_b256_fused"])
        bench_serving_rest(ctx)
        bench_training(["bf16_b128", "f32_b32"])
        # granule goes LAST: it is the most tunnel-exposed stage (cold
        # device_tiling compiles have been observed to wedge >40 min under
        # congestion), and it now emits per mode, so whatever it measures
        # before the wall still lands
        bench_granule(ctx)
    except BaseException as exc:  # pragma: no cover
        print(f"bench worker died: {exc!r}", file=sys.stderr)


def main():
    done = threading.Event()

    def _finish(tag):
        emit(tag)
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)

    def _on_signal(signum, frame):  # pragma: no cover
        _finish(f"signal {signum}")

    # the MAIN thread only sleeps below, so these fire promptly even when
    # the worker is wedged inside an uninterruptible tunnel call
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    t = threading.Thread(target=lambda: (_worker(), done.set()), daemon=True)
    t.start()
    remaining = _WALL_S - (time.perf_counter() - _T0)
    done.wait(timeout=max(1.0, remaining))
    _finish("wall" if not done.is_set() else "complete")


if __name__ == "__main__":
    main()
