#!/usr/bin/env python3
"""Profile the serving step with jax.profiler and print an op-time breakdown.

The reference has no profiling/tracing story (SURVEY.md §5); this tool is the
framework's observability entry point — it drove the BN-folding and
space-to-depth optimisation rounds documented in models/fused.py and
models/packed.py.

    python tools/profile_serving.py [--batch 512] [--path bn_folded|s2d_packed]
    # writes a TensorBoard-compatible trace under /tmp/sifsr_trace and prints
    # the top device ops by total time
"""

import collections
import glob
import gzip
import json
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--path", default="bn_folded",
                        choices=["bn_folded", "s2d_packed", "int8", "pallas",
                                 "pallas_prow"])
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--trace-dir", default="/tmp/sifsr_trace")
    parser.add_argument("--top", type=int, default=20)
    args = parser.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from sifsr_tpu.data.statistics import Statistics
    from sifsr_tpu.models.unet import ModelB2

    model = ModelB2()
    stats = Statistics(maxi=330.0, mini=260.0, mean_lst=295.0, std_lst=10.0,
                       mean_ndvi=0.3, std_ndvi=0.25)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 2)), train=False)

    rng0 = np.random.default_rng(1)
    cal_lst = (290.0 + 5.0 * rng0.random((8, 64, 64))).astype(np.float32)
    cal_ndvi = (rng0.random((8, 256, 256)) * 0.8).astype(np.float32)
    if args.path == "bn_folded":
        from sifsr_tpu.inference import make_sr_step

        step, params = make_sr_step(model, stats), variables
    elif args.path == "int8":
        from sifsr_tpu.models.quantized import (
            calibrate_activation_scales, make_int8_sr_step, quantize_serving_params)

        params = calibrate_activation_scales(
            variables, quantize_serving_params(variables), cal_lst, cal_ndvi, stats)
        step = make_int8_sr_step(stats)
    elif args.path in ("pallas", "pallas_prow"):
        from sifsr_tpu.models.pallas_serving import (
            build_pallas_serving_params, make_pallas_sr_step)

        params = build_pallas_serving_params(variables, cal_lst, cal_ndvi, stats)
        step = make_pallas_sr_step(
            stats, mid="prow" if args.path == "pallas_prow" else "xla")
    else:
        from sifsr_tpu.models.packed import make_packed_sr_step, pack_serving_params

        step, params = make_packed_sr_step(stats), pack_serving_params(variables)

    rng = np.random.default_rng(0)
    lst = jnp.asarray(290 + 5 * rng.random((args.batch, 64, 64)), jnp.float32)
    ndvi = jnp.asarray(rng.random((args.batch, 256, 256)) * 0.8, jnp.float32)
    float(step(params, lst, ndvi).mean())  # compile + force through the tunnel

    jax.profiler.start_trace(args.trace_dir)
    out = None
    for _ in range(args.iters):
        out = step(params, lst, ndvi)
    float(out.mean())
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(os.path.join(args.trace_dir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(traces[-1]) as f:
        trace = json.load(f)
    durations = collections.Counter()
    skip = ("$", "asarray", "_value", "wrapper", "jit_", "Pjit", "stop_trace")
    for event in trace["traceEvents"]:
        if event.get("ph") == "X" and "dur" in event:
            name = event.get("name", "")
            if any(s in name for s in skip):
                continue
            durations[name] += event["dur"]
    total = sum(durations.values())
    print(f"device op time: {total / 1000:.1f} ms over {args.iters} iters "
          f"({args.batch * args.iters * 1e6 / total:,.0f} patches/s device-bound)")
    for name, dur in durations.most_common(args.top):
        print(f"{dur / 1000:8.2f} ms {100 * dur / total:5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
