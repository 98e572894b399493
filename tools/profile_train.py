#!/usr/bin/env python3
"""Profile the jitted train step with jax.profiler and print an op breakdown.

Training counterpart of tools/profile_serving.py — the reference's training
loop has no profiling story (it times epochs with time.time(),
/root/reference/train_model_B_predef_filters.py:268); this drives the
round-4 training-perf work (VERDICT item 4).

    python tools/profile_train.py [--batch 256] [--dtype bf16] [--remat]
    # writes a trace under /tmp/sifsr_train_trace and prints the top device
    # ops by total time plus a samples/s summary
"""

import collections
import glob
import gzip
import json
import os
import sys
import time
from argparse import ArgumentParser

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    parser.add_argument("--recipe", default="predef_filters")
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--pad-impl", default="explicit",
                        choices=["explicit", "fused", "zeros"],
                        help="conv padding: explicit reference pads, fused "
                             "border-ring correction, or zeros (SAME conv "
                             "counterfactual — NOT replicate semantics, "
                             "upper-bound probe only)")
    parser.add_argument("--metrics", action="store_true",
                        help="include on-device psnr/ssim metrics in the step")
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--trace-dir", default="/tmp/sifsr_train_trace")
    parser.add_argument("--top", type=int, default=25)
    args = parser.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax import lax

    from sifsr_tpu.data import make_synthetic_dataset
    from sifsr_tpu.data.datasets import prepare_batch
    from sifsr_tpu.models.unet import ModelB2
    from sifsr_tpu.train.state import create_train_state
    from sifsr_tpu.train.step import make_train_step

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    precision = (lax.Precision.DEFAULT if args.dtype == "bf16"
                 else lax.Precision.HIGHEST)
    if args.pad_impl == "zeros":
        model = ModelB2(dtype=dtype, precision=precision,
                        padding_mode="zeros")
    else:
        model = ModelB2(dtype=dtype, precision=precision,
                        pad_impl=args.pad_impl)
    state = create_train_state(model, 1e-3, rng=jax.random.key(0),
                               input_hw=(256, 256))
    step = make_train_step(model, args.recipe, alpha=0.99, gamma=-0.5,
                           mean_lst=295.0, std_lst=10.0,
                           with_metrics=args.metrics, remat=args.remat)

    ds = make_synthetic_dataset(8, seed=0)
    raw = next(ds.batches(8, seed=0))
    reps = -(-args.batch // raw["lst"].shape[0])
    batch = prepare_batch({
        k: jnp.tile(jnp.asarray(v), (reps, 1, 1, 1))[:args.batch]
        for k, v in raw.items()
    })

    state, m = step(state, batch)  # compile
    float(m["loss"])

    # wall timing with a dependency-chained state (the axon tunnel's
    # block_until_ready is a no-op; the state chain forces real execution)
    t0 = time.perf_counter()
    s, last = state, None
    for _ in range(args.iters):
        s, m = step(s, batch)
        last = m["loss"]
    float(last)
    wall = time.perf_counter() - t0
    print(f"wall: {wall * 1000 / args.iters:.1f} ms/step = "
          f"{args.batch * args.iters / wall:,.0f} samples/s")

    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.iters):
        s, m = step(s, batch)
    float(m["loss"])
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(os.path.join(
        args.trace_dir, "plugins/profile/*/*.trace.json.gz")))
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
          f"({args.batch * args.iters * 1e6 / total:,.0f} samples/s device-bound)")
    for name, dur in durations.most_common(args.top):
        print(f"{dur / 1000:8.2f} ms {100 * dur / total:5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
