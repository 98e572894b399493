#!/usr/bin/env python3
"""Headline benchmark: 64->256 SR patches/sec/chip through the full serving
step (normalise + bicubic x4 + ModelB U-Net forward + de-normalise, bf16).

Prints ONE JSON line:
  {"metric": "sr_patches_per_sec_per_chip", "value": N, "unit": "patches/s",
   "vs_baseline": N / 10000}

Baseline: the BASELINE.json north-star of 10k patches/sec/chip on TPU v5e
(the reference itself runs batch-1 on CPU/GPU with per-block host round-trips;
see BASELINE.md).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from sifsr_tpu.data.statistics import Statistics
    from sifsr_tpu.inference import make_sr_step
    from sifsr_tpu.models.packed import make_packed_sr_step, pack_serving_params
    from sifsr_tpu.models.unet import ModelB2

    model = ModelB2()
    stats = Statistics(maxi=330.0, mini=260.0, mean_lst=295.0, std_lst=10.0,
                       mean_ndvi=0.3, std_ndvi=0.25)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 2)), train=False)

    # serving paths: BN-folded bf16 NHWC; space-to-depth packed; and
    # static-calibrated int8 (int8 MXU convs + fully-fused requant chain —
    # quality measured at ~0.07 K RMSE vs f32 on held-out real pairs, see
    # models/quantized.py). Pick whichever is fastest on this chip today.
    from sifsr_tpu.models.quantized import (
        calibrate_activation_scales,
        make_int8_sr_step,
        quantize_serving_params,
    )

    cal_rng = np.random.default_rng(1)
    cal_lst = (290.0 + 5.0 * cal_rng.random((8, 64, 64))).astype(np.float32)
    cal_ndvi = (cal_rng.random((8, 256, 256)) * 0.8).astype(np.float32)
    qparams = calibrate_activation_scales(
        variables, quantize_serving_params(variables), cal_lst, cal_ndvi, stats
    )

    candidates = {
        "bn_folded": (make_sr_step(model, stats), variables),
        "s2d_packed": (make_packed_sr_step(stats), pack_serving_params(variables)),
        "int8_static": (make_int8_sr_step(stats), qparams),
    }

    rng = np.random.default_rng(0)
    best = 0.0
    best_batch = 0
    best_path = ""
    # one batch size (compiles through the remote tunnel are slow: ~30-150s
    # each); per-path failures are isolated so one broken path can't zero the
    # whole benchmark
    for batch in (1024,):
        lst = jnp.asarray(290.0 + 5.0 * rng.random((batch, 64, 64)), dtype=jnp.float32)
        ndvi = jnp.asarray(rng.random((batch, 256, 256)) * 0.8, dtype=jnp.float32)
        for path, (sr_step, params) in candidates.items():
            try:
                # warmup (compile) — force execution with a host fetch, since
                # block_until_ready does not synchronise through the axon tunnel
                float(sr_step(params, lst, ndvi).mean())

                n_iters = 10
                t0 = time.perf_counter()
                acc = jnp.zeros(())
                for _ in range(n_iters):
                    # chain a data dependency so every step really executes
                    acc = acc + sr_step(params, lst, ndvi).mean()
                float(acc)
                dt = time.perf_counter() - t0
            except Exception as exc:  # pragma: no cover — path-level isolation
                import sys

                print(f"bench path {path} failed: {exc}", file=sys.stderr)
                continue
            pps = batch * n_iters / dt
            if pps > best:
                best, best_batch, best_path = pps, batch, path

    print(json.dumps({
        "metric": "sr_patches_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "patches/s",
        "vs_baseline": round(best / 10000.0, 3),
        "batch": best_batch,
        "path": best_path,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
