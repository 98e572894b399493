#!/usr/bin/env python3
"""Attribute profiled fusion names to HLO content for the train step.

Compiles the train step, dumps HLO, and for each requested fusion name
prints what ops its fused computation contains (conv / reduce / elementwise),
so the profile in tools/profile_train.py becomes interpretable.
"""
import os
import re
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    p = ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--dtype", default="bf16")
    p.add_argument("names", nargs="*", help="fusion names e.g. fusion.605")
    args = p.parse_args()

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
    model = ModelB2(dtype=dtype, precision=precision)
    state = create_train_state(model, 1e-3, rng=jax.random.key(0),
                               input_hw=(256, 256))
    step = make_train_step(model, "predef_filters", alpha=0.99, gamma=-0.5,
                           mean_lst=295.0, std_lst=10.0, with_metrics=False)
    ds = make_synthetic_dataset(8, seed=0)
    raw = next(ds.batches(8, seed=0))
    reps = -(-args.batch // raw["lst"].shape[0])
    batch = prepare_batch({
        k: jnp.tile(jnp.asarray(v), (reps, 1, 1, 1))[:args.batch]
        for k, v in raw.items()
    })
    txt = step.lower(state, batch).compile().as_text()

    # map each fusion to its called computation's op mix
    comp_ops = {}  # computation name -> Counter of opcodes
    cur = None
    import collections
    for line in txt.splitlines():
        m = re.match(r"\s*%?([\w\.\-]+)\s+\([^)]*\)\s*->", line)
        if line.startswith("%") or (line and not line.startswith(" ") and "{" in line):
            mm = re.match(r"%?([\w\.\-_]+)\s*\(", line.strip().lstrip("%"))
            if mm:
                cur = mm.group(1)
                comp_ops[cur] = collections.Counter()
            continue
        if cur is None:
            continue
        mo = re.search(r"=\s+[\w\[\]\{\},:\s]*?\b(convolution|dot|reduce-window|reduce|transpose|copy|gather|scatter|concatenate|broadcast|custom-call|iota|pad|slice|reverse|convert|add|multiply|subtract|divide|select|compare|exp|rsqrt)\b", line)
        if mo:
            comp_ops[cur][mo.group(1)] += 1

    # map fusion instruction -> computation + shape
    fus = {}
    for line in txt.splitlines():
        m = re.search(r"%?([\w\.]+) = (\S+) fusion\(.*calls=%?([\w\.\-_]+)", line)
        if m:
            fus[m.group(1)] = (m.group(2), m.group(3))
    names = args.names or list(fus)[:0]
    for n in names:
        key = n.lstrip("%")
        if key in fus:
            shape, comp = fus[key]
            ops = comp_ops.get(comp, {})
            big = ", ".join(f"{k}x{v}" for k, v in sorted(
                ops.items(), key=lambda kv: -kv[1])[:8])
            print(f"{key}: out={shape} comp={comp} ops[{big}]")
        else:
            print(f"{key}: not found")
    # also: top-level convolution/dot instruction count summary
    total = collections.Counter()
    for c, ops in comp_ops.items():
        total.update(ops)
    print("module op totals:", dict(sorted(total.items(), key=lambda kv: -kv[1])[:14]))


if __name__ == "__main__":
    main()
