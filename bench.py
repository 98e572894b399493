#!/usr/bin/env python3
"""Headline benchmark: 64->256 SR patches/sec/chip through the full serving
step (normalise + bicubic x4 + ModelB U-Net forward + de-normalise).

Prints ONE JSON line:
  {"metric": "sr_patches_per_sec_per_chip", "value": N, "unit": "patches/s",
   "vs_baseline": N / 10000, "paths": {...}, "mfu_int8": ...,
   "train_samples_per_sec": {...}}

Baseline: the BASELINE.json north-star of 10k patches/sec/chip on TPU v5e
(the reference itself runs batch-1 on CPU/GPU with per-block host round-trips;
see BASELINE.md). MFU is derived from the analytic conv FLOPs of one 64->256
patch (~3.0 GFLOP, SURVEY.md §3.6 channel map) against the v5e int8 peak
(394 TOPS).

Serving paths raced (failures are isolated per path):
  pallas_full — the full-pallas int8 U-Net, mid='prow'
              (models/pallas_serving.py) — the headline path;
  pallas_i8 — pallas front/tail + XLA int8 mid chain;
  int8_static — static-calibrated int8 XLA convs (models/quantized.py);
  bf16 — BN-folded bf16 XLA graph with fused replicate pads
              (the serve-daemon default path).

Training throughput is measured on synthetic data through the full jitted
step (fwd + sensor-model ds-loss + Sobel percep loss + bwd + Adam):
  f32_b32  — reference-parity config (HIGHEST precision, batch 32);
  bf16_b128 — mixed-precision config (bf16 compute, f32 master weights);
  bf16_b256_fused — + fused replicate-pad convs (the round-4 fast path).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# counted per-patch conv FLOPs (sifsr_tpu.utils.flops.modelb2_conv_flops —
# a programmatic walk of the ModelB2 channel plan, regression-tested in
# tests/test_flops.py; replaces the round-3 hardcoded 3.0e9 estimate)
from sifsr_tpu.utils.flops import modelb2_conv_flops

PATCH_FLOPS = modelb2_conv_flops()          # 2.850e9
V5E_INT8_PEAK = 394e12
V5E_BF16_PEAK = 197e12
# counted train-step cost per sample: XLA cost analysis of the full jitted
# predef_filters step (fwd + PSF ds-loss + Sobel percep + bwd + Adam),
# measured via utils.flops.xla_flops — 12.21 GFLOP/sample at batch 8 f32
TRAIN_FLOPS_PER_SAMPLE = 12.21e9

# Soft deadline: the tunnel to the remote TPU has minutes-scale latency
# variance (a trivial jit ranges 3 s .. 10 min under backlog), and the
# driver bounds this script's wall time. The HEADLINE stage always runs;
# comparison paths / granule modes / training rows are skipped once the
# elapsed wall passes the deadline, so a congested tunnel degrades the
# report instead of producing no JSON line at all.
_T0 = time.perf_counter()
_DEADLINE_S = float(os.environ.get("SIFSR_BENCH_DEADLINE_S", "1500"))


def _skip(stage):
    """True (and log) if the soft deadline has passed for an optional stage."""
    elapsed = time.perf_counter() - _T0
    if elapsed > _DEADLINE_S:
        print(f"bench: skipping optional stage {stage!r} "
              f"({elapsed:.0f}s elapsed > {_DEADLINE_S:.0f}s deadline)",
              file=sys.stderr)
        return True
    return False


def _mark(stage):
    print(f"bench: {stage} done at t+{time.perf_counter() - _T0:.0f}s",
          file=sys.stderr)


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


def bench_serving():
    from sifsr_tpu.data.statistics import Statistics
    from sifsr_tpu.models.unet import ModelB2

    model = ModelB2()
    stats = Statistics(maxi=330.0, mini=260.0, mean_lst=295.0, std_lst=10.0,
                       mean_ndvi=0.3, std_ndvi=0.25)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 2)), train=False)

    rng = np.random.default_rng(1)
    cal_lst = (290.0 + 5.0 * rng.random((8, 64, 64))).astype(np.float32)
    cal_ndvi = (rng.random((8, 256, 256)) * 0.8).astype(np.float32)

    # each path races at its own best batch (a serving deployment knob):
    # the pallas path's device time is batch-linear from 256 up, while the
    # XLA int8 path amortises its fixed passes best at 1024
    candidates = {}
    pallas_params = None
    try:
        from sifsr_tpu.models.pallas_serving import (
            build_pallas_serving_params, make_pallas_sr_step)

        pallas_params = build_pallas_serving_params(variables, cal_lst, cal_ndvi, stats)
        candidates["pallas_i8"] = (
            make_pallas_sr_step(stats, mid="xla"),
            pallas_params,
            256,
        )
        candidates["pallas_full"] = (
            make_pallas_sr_step(stats, mid="prow"),
            pallas_params,
            384,  # measured best: 384 > 256 > 512 (dispatch amortisation
                  # vs the kernels' per-image ib blocking)
        )
    except Exception as exc:  # pragma: no cover
        print(f"pallas setup failed: {exc}", file=sys.stderr)
    try:
        from sifsr_tpu.models.quantized import (
            calibrate_activation_scales, make_int8_sr_step, quantize_serving_params)

        qparams = calibrate_activation_scales(
            variables, quantize_serving_params(variables), cal_lst, cal_ndvi, stats)
        candidates["int8_static"] = (make_int8_sr_step(stats), qparams, 1024)
    except Exception as exc:  # pragma: no cover
        print(f"int8_static setup failed: {exc}", file=sys.stderr)

    # the headline path (pallas_full) always runs; the comparison paths are
    # deadline-skippable so a congested tunnel still yields the JSON line
    paths = {}
    batches = {}
    try:
        from sifsr_tpu.inference import make_sr_step

        # the BN-folded bf16 XLA path (serve-daemon default; round-4 fused
        # replicate pads — comparison row, not the headline)
        candidates["bf16"] = (
            make_sr_step(model, stats, jnp.bfloat16, True), variables, 256)
    except Exception as exc:  # pragma: no cover
        print(f"bf16 setup failed: {exc}", file=sys.stderr)

    for name in ("pallas_full", "pallas_i8", "int8_static", "bf16"):
        if name not in candidates:
            continue
        if name != "pallas_full" and _skip(f"serving path {name}"):
            continue
        sr_step, params, batch = candidates[name]
        lst = jnp.asarray(290.0 + 5.0 * rng.random((batch, 64, 64)), dtype=jnp.float32)
        ndvi = jnp.asarray(rng.random((batch, 256, 256)) * 0.8, dtype=jnp.float32)
        try:
            # headline gets extra repeats: the min of a deterministic device
            # chain only sheds tunnel/host noise with enough draws
            dt, iters = _measure(lambda l, n: sr_step(params, l, n), lst, ndvi,
                                 iters=50,  # one tunnel sync per chain:
                                            # 50 iters keeps it <1% of dt
                                 repeats=5 if name == "pallas_full" else 3)
            paths[name] = round(batch * iters / dt, 1)
            batches[name] = batch
            _mark(f"serving path {name}")
        except Exception as exc:  # pragma: no cover
            print(f"bench path {name} failed: {exc}", file=sys.stderr)

    # whole-granule wall: the deployable number — host tile extraction +
    # transfers + device SR + host mosaic scatter, double-buffered
    # (inference.predict_granule), on a synthetic full 1200x1200 granule
    granule = None
    if pallas_params is not None and paths and not _skip("granule modes"):
        try:
            from sifsr_tpu.inference import predict_granule
            from sifsr_tpu.models.pallas_serving import make_pallas_sr_step

            best_mid = "prow" if paths.get("pallas_full", 0) >= paths.get(
                "pallas_i8", 0) else "xla"
            g_step = make_pallas_sr_step(stats, mid=best_mid)
            lst_g = (290.0 + 5.0 * rng.random((1200, 1200))).astype(np.float32)
            ndvi_g = (rng.random((4800, 4800)) * 0.8).astype(np.float32)
            kw = dict(stats=stats, batch_size=108, sr_step=g_step,
                      step_params=pallas_params)
            reps = 4
            modes = {}
            for name, mkw in (("host_pipeline", {}),
                              ("device_tiling", {"device_tiling": True}),
                              ("device_tiling_wire",
                               {"device_tiling": True, "wire": "int"})):
                if modes and _skip(f"granule mode {name}"):
                    continue
                predict_granule(None, lst_g, ndvi_g, **kw, **mkw)  # warm
                best_rep = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    predict_granule(None, lst_g, ndvi_g, **kw, **mkw)
                    best_rep = min(best_rep, time.perf_counter() - t0)
                modes[name] = best_rep  # fastest rep: device time is
                # deterministic, the min strips tunnel/host noise
            mode = min(modes, key=modes.get)
            dt = modes[mode] * reps
            n_patches = (1200 // 64) * (1200 // 64)  # 324 blocks/granule

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
            granule = {
                "patches_per_sec_wall": round(reps * n_patches / dt, 1),
                "granule_seconds": round(dt / reps, 3),
                "mid": best_mid,
                "mode": mode,
                "modes_seconds": {k: round(v, 3) for k, v in modes.items()},
                "tunnel_host_to_device_mb_s": round(h2d, 1),
            }
        except Exception as exc:  # pragma: no cover
            print(f"granule bench failed: {exc}", file=sys.stderr)
        _mark("granule modes")
    return paths, batches, granule


def bench_training():
    from sifsr_tpu.config import HyperParams, TrainConfig
    from sifsr_tpu.data import make_synthetic_dataset
    from sifsr_tpu.models.unet import ModelB2
    from sifsr_tpu.train.state import create_train_state
    from sifsr_tpu.train.step import make_train_step
    from jax import lax

    results = {}
    ds = make_synthetic_dataset(8, seed=0)
    from sifsr_tpu.data.datasets import prepare_batch

    raw = next(ds.batches(8, seed=0))

    for name, (dtype, precision, batch, pad_impl) in {
        "f32_b32": (jnp.float32, lax.Precision.HIGHEST, 32, "explicit"),
        "bf16_b128": (jnp.bfloat16, lax.Precision.DEFAULT, 128, "explicit"),
        # the round-4 training fast path: fused replicate-pad convs skip the
        # padded-input copies (models.unet.Conv3x3; measured 1.28k -> 1.87k
        # samples/s at the b256 sweep optimum)
        "bf16_b256_fused": (jnp.bfloat16, lax.Precision.DEFAULT, 256, "fused"),
    }.items():
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

            # measure with a persistent state chain so the optimizer update runs
            state2, m = step(state, batch_dict)
            float(m["loss"])  # compile
            iters = 10
            t0 = time.perf_counter()
            s = state2
            last = None
            for _ in range(iters):
                s, m = step(s, batch_dict)
                last = m["loss"]
            float(last)
            dt = time.perf_counter() - t0
            results[name] = round(batch * iters / dt, 1)
            _mark(f"training row {name}")
        except Exception as exc:  # pragma: no cover
            print(f"train bench {name} failed: {exc}", file=sys.stderr)
    return results


def main():
    paths, batches, granule = bench_serving()
    train = bench_training()
    best_path = max(paths, key=paths.get) if paths else ""
    best = paths.get(best_path, 0.0)
    print(json.dumps({
        "metric": "sr_patches_per_sec_per_chip",
        "value": best,
        "unit": "patches/s",
        "vs_baseline": round(best / 10000.0, 3),
        "batch": batches.get(best_path),
        "path": best_path,
        "paths": paths,
        "granule": granule,
        "mfu_int8": round(best * PATCH_FLOPS / V5E_INT8_PEAK, 4),
        "train_samples_per_sec": train,
        "train_mfu_bf16": (
            round(train["bf16_b128"] * TRAIN_FLOPS_PER_SAMPLE / V5E_BF16_PEAK, 4)
            if "bf16_b128" in train else None),
        "train_mfu_bf16_fused": (
            round(train["bf16_b256_fused"] * TRAIN_FLOPS_PER_SAMPLE / V5E_BF16_PEAK, 4)
            if "bf16_b256_fused" in train else None),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
