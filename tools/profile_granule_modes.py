#!/usr/bin/env python3
"""Break the whole-granule serving wall down into upload / compute / download
per mode (VERDICT r3 weak-point 5: why does device_tiling lose to the host
pipeline when transfers are the wall?).

    python tools/profile_granule_modes.py [--reps 3]
"""
import os
import sys
import time
from argparse import ArgumentParser

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    p = ArgumentParser()
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from sifsr_tpu.data.statistics import Statistics
    from sifsr_tpu.inference import (
        predict_granule, encode_wire, _device_tiling_fn)
    from sifsr_tpu.models.pallas_serving import (
        build_pallas_serving_params, make_pallas_sr_step)
    from sifsr_tpu.models.unet import ModelB2

    model = ModelB2()
    stats = Statistics(maxi=330.0, mini=260.0, mean_lst=295.0, std_lst=10.0,
                       mean_ndvi=0.3, std_ndvi=0.25)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 2)),
                           train=False)
    rng0 = np.random.default_rng(1)
    cal_lst = (290.0 + 5.0 * rng0.random((8, 64, 64))).astype(np.float32)
    cal_ndvi = (rng0.random((8, 256, 256)) * 0.8).astype(np.float32)
    params = build_pallas_serving_params(variables, cal_lst, cal_ndvi, stats)
    g_step = make_pallas_sr_step(stats, mid="prow")

    rng = np.random.default_rng(0)
    lst_g = (290.0 + 5.0 * rng.random((1200, 1200))).astype(np.float32)
    ndvi_g = (rng.random((4800, 4800)) * 0.8).astype(np.float32)

    def sync_upload(arrs):
        devs = [jax.device_put(a) for a in arrs]
        for d in devs:
            float(jnp.asarray(d).ravel()[-1])  # dependent read = real sync
        return devs

    # ---- raw link rates at the exact payloads each mode ships
    for label, arrs in (
        ("f32 granules (lst 5.8 MB + ndvi 92 MB)", (lst_g, ndvi_g)),
        ("wire granules (uint16/int16, half bytes)", encode_wire(lst_g, ndvi_g)),
    ):
        sync_upload([a[:16] for a in arrs])  # warm path
        t0 = time.perf_counter()
        sync_upload(arrs)
        up = time.perf_counter() - t0
        nbytes = sum(a.nbytes for a in arrs)
        print(f"upload {label}: {up:.3f} s ({nbytes / up / 1e6:.1f} MB/s)")

    # ---- device_tiling: on-device compute time vs end-to-end
    for wire in (False, True):
        gh = gw = 1200 // 64
        run = _device_tiling_fn(g_step, 64, 4, gh, gw, 108, 1.0, wire=wire)
        if wire:
            l_in, n_in = encode_wire(lst_g, ndvi_g)
        else:
            l_in, n_in = lst_g, ndvi_g
        ld, nd = sync_upload([l_in, n_in])
        out = run(ld, nd, params)
        float(jnp.asarray(out).ravel()[-1])  # compile
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = run(ld, nd, params)
            float(jnp.asarray(out).ravel()[-1])
        comp = (time.perf_counter() - t0) / args.reps
        t0 = time.perf_counter()
        host = np.asarray(out)
        down = time.perf_counter() - t0
        t0 = time.perf_counter()
        ld, nd = sync_upload([l_in, n_in])
        up = time.perf_counter() - t0
        name = "device_tiling" + ("_wire" if wire else "")
        print(f"{name}: upload {up:.3f} s + compute {comp:.3f} s + "
              f"download {down:.3f} s ({host.nbytes / 1e6:.0f} MB out) = "
              f"{up + comp + down:.3f} s serialized")

    # ---- end-to-end walls for reference
    kw = dict(stats=stats, batch_size=108, sr_step=g_step, step_params=params)
    for name, mkw in (("host_pipeline", {}),
                      ("host_pipeline_wire", {"wire": "int"}),
                      ("device_tiling", {"device_tiling": True}),
                      ("device_tiling_wire", {"device_tiling": True,
                                              "wire": "int"})):
        predict_granule(None, lst_g, ndvi_g, **kw, **mkw)  # warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            predict_granule(None, lst_g, ndvi_g, **kw, **mkw)
            best = min(best, time.perf_counter() - t0)
        print(f"e2e {name}: {best:.3f} s/granule")


if __name__ == "__main__":
    main()
