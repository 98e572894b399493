#!/usr/bin/env python3
"""Fixed-seed bf16-vs-f32 convergence head-to-head (VERDICT r2 item 7).

The mixed-precision recipe (bf16 compute, f32 master weights + BN stats) is
the recommended training config at ~9x the f32 throughput (BENCH_r02);
this produces the evidence: same seed, same synthetic data, both precisions
through the full predef_filters train loop for >=20 epochs, writing
results/bf16_vs_f32/convergence.json + a curve PNG.

    python tools/bf16_convergence.py [--epochs 24] [--n-train 32] [--out results/bf16_vs_f32]
"""

import json
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def run(epochs: int, n_train: int, n_val: int, out_dir: str):
    import numpy as np

    import jax.numpy as jnp
    from jax import lax

    from sifsr_tpu.config import HyperParams, TrainConfig
    from sifsr_tpu.data import make_synthetic_dataset
    from sifsr_tpu.models.unet import ModelB2
    from sifsr_tpu.train.loop import train_loop

    cfg = TrainConfig(
        hyper=HyperParams(batch_size=8, learning_rate=1e-3, n_epochs=epochs,
                          patience=epochs + 1, alpha=0.99, gamma=-0.5),
        recipe="predef_filters",
        seed=0,
    )
    train_ds = make_synthetic_dataset(n_train, seed=11)
    val_ds = make_synthetic_dataset(n_val, seed=12)

    curves = {}
    for name, (dtype, prec) in {
        "f32": (jnp.float32, lax.Precision.HIGHEST),
        "bf16": (jnp.bfloat16, lax.Precision.DEFAULT),
    }.items():
        model = ModelB2(dtype=dtype, precision=prec)
        _, metrics = train_loop(cfg, train_ds, val_ds, model=model,
                                log_fn=lambda s: print(f"[{name}] {s}"))
        curves[name] = {
            "train_loss": [float(x) for x in metrics["train_loss"]],
            "val_loss": [float(x) for x in metrics["val_loss"]],
            "best_epoch": int(metrics["best_epoch"]),
        }

    f32v = np.asarray(curves["f32"]["val_loss"])
    bf16v = np.asarray(curves["bf16"]["val_loss"])
    rel = np.abs(bf16v - f32v) / np.maximum(np.abs(f32v), 1e-12)
    summary = {
        "epochs": epochs,
        "final_val_f32": float(f32v[-1]),
        "final_val_bf16": float(bf16v[-1]),
        "final_rel_diff": float(rel[-1]),
        "mean_rel_diff": float(rel.mean()),
        "max_rel_diff": float(rel.max()),
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "convergence.json"), "w") as f:
        json.dump({"summary": summary, "curves": curves}, f, indent=1)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ep = np.arange(1, epochs + 1)
    plt.figure(figsize=(7, 4.5))
    plt.semilogy(ep, curves["f32"]["val_loss"], "o-", label="f32 (HIGHEST)")
    plt.semilogy(ep, curves["bf16"]["val_loss"], "s--",
                 label="bf16 compute / f32 master")
    plt.semilogy(ep, curves["f32"]["train_loss"], alpha=0.4, label="f32 train")
    plt.semilogy(ep, curves["bf16"]["train_loss"], alpha=0.4, label="bf16 train")
    plt.xlabel("epoch")
    plt.ylabel("loss")
    plt.title("bf16 vs f32: fixed-seed predef_filters convergence")
    plt.legend()
    plt.grid(alpha=0.3)
    plt.savefig(os.path.join(out_dir, "convergence.png"), dpi=110,
                bbox_inches="tight")
    print(json.dumps(summary))
    return summary


def main():
    p = ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=24)
    p.add_argument("--n-train", type=int, default=32)
    p.add_argument("--n-val", type=int, default=8)
    p.add_argument("--out", default="results/bf16_vs_f32")
    a = p.parse_args()
    run(a.epochs, a.n_train, a.n_val, a.out)


if __name__ == "__main__":
    main()
