"""One fused train/eval step per recipe: forward + sensor-model degradation +
both loss terms + backward + Adam + on-device metrics, in a single jit.

This fixes the reference's three hot-loop inefficiencies (SURVEY.md §3.1):
per-batch Sobel tensor construction, per-batch host metric computation
(psnr/ssim via .cpu().numpy() + skimage), and the Python-interpreted datapath.

Batch convention (all NHWC, single channel):
  recipe 'predef_filters' / 'gradftm':
      {'lst': (N,64,64,1), 'lst_up': (N,256,256,1), 'ndvi': (N,256,256,1)}
  recipe 'scale_invariance':
      {'lst_up': (N,64,64,1) [=4km bicubic-up], 'ndvi': (N,64,64,1) [=1km],
       'lst': (N,64,64,1) [=1km target]}
  (the scale-invariance recipe reuses the same keys: lst is always the
   reconstruction target, lst_up always the first model input channel.)

Train-time PSNR/SSIM follow the reference's convention of scoring SR against
the *bicubic input* (there is no HR ground truth; train_model_B_*.py:142-143)
— for scale_invariance they score against the 1 km target like the reference
(train_model_B_scale_invariance.py:106-107).
"""

from __future__ import annotations


import functools

import jax
import jax.numpy as jnp

from sifsr_tpu.eval.metrics import psnr_batch_mean, ssim_batch_mean
from sifsr_tpu.losses.losses import (
    scale_invariance_loss,
    sif_loss_gradftm,
    sif_loss_predef,
)
from sifsr_tpu.models.unet import ModelB2
from sifsr_tpu.train.state import SifTrainState

__all__ = ["make_train_step", "make_eval_step"]

RECIPES = ("predef_filters", "gradftm", "scale_invariance")


def _loss_and_aux(recipe, sr, batch, alpha, gamma, mean_lst, std_lst, mesh=None):
    if recipe == "predef_filters":
        return sif_loss_predef(sr, batch["lst"], batch["ndvi"], alpha, gamma,
                               mean_lst, std_lst, mesh=mesh)
    if recipe == "gradftm":
        return sif_loss_gradftm(sr, batch["lst"], batch["ndvi"], alpha, gamma,
                                mean_lst, std_lst, mesh=mesh)
    if recipe == "scale_invariance":
        return scale_invariance_loss(sr, batch["lst"])
    raise ValueError(f"unknown recipe {recipe!r}; expected one of {RECIPES}")


def _metric_target(recipe, batch):
    # reference scores vs bicubic input (SR1/SR2) or the 1 km target (SC-Unet)
    return batch["lst"] if recipe == "scale_invariance" else batch["lst_up"]


def make_train_step(
    model: ModelB2,
    recipe: str,
    alpha: float,
    gamma: float,
    mean_lst: float,
    std_lst: float,
    with_metrics: bool = True,
    mesh=None,
    remat: bool = False,
):
    """Build the jitted train step: (state, batch) -> (state, metrics dict).

    ``mesh``: the training Mesh when running multi-chip — threads through to
    ds_loss so the fused Pallas degradation kernel runs shard_mapped over the
    batch axis instead of falling back to the matmul chain.

    ``remat``: wrap the forward+loss graph in ``jax.checkpoint`` so its
    activations are recomputed during the backward pass instead of held in
    HBM across it — identical numerics, ~one extra forward of FLOPs,
    activation-memory ceiling on batch size lifted."""

    def forward(params, batch_stats, batch):
        x = jnp.concatenate([batch["lst_up"], batch["ndvi"]], axis=-1)
        sr, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        total, parts = _loss_and_aux(recipe, sr, batch, alpha, gamma,
                                     mean_lst, std_lst, mesh=mesh)
        return total, (updates["batch_stats"], parts, sr)

    if remat:
        forward = jax.checkpoint(forward)

    # donating the incoming state lets XLA update params/opt-state/BN
    # buffers in place instead of allocating a second copy of every tensor
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: SifTrainState, batch: dict):
        def loss_fn(params):
            return forward(params, state.batch_stats, batch)

        (total, (new_bs, parts, sr)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads, new_bs)
        metrics = {"loss": total, **parts}
        if with_metrics:
            target = _metric_target(recipe, batch)[..., 0]
            metrics["psnr"] = psnr_batch_mean(sr[..., 0], target)
            metrics["ssim"] = ssim_batch_mean(sr[..., 0], target)
        return state, metrics

    return train_step


def make_eval_step(
    model: ModelB2,
    recipe: str,
    alpha: float,
    gamma: float,
    mean_lst: float,
    std_lst: float,
    with_metrics: bool = True,
    mesh=None,
):
    """Build the jitted eval step: (state, batch) -> metrics dict."""

    @jax.jit
    def eval_step(state: SifTrainState, batch: dict):
        x = jnp.concatenate([batch["lst_up"], batch["ndvi"]], axis=-1)
        sr = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, x, train=False
        )
        total, parts = _loss_and_aux(recipe, sr, batch, alpha, gamma,
                                     mean_lst, std_lst, mesh=mesh)
        metrics = {"loss": total, **parts}
        if with_metrics:
            target = _metric_target(recipe, batch)[..., 0]
            metrics["psnr"] = psnr_batch_mean(sr[..., 0], target)
            metrics["ssim"] = ssim_batch_mean(sr[..., 0], target)
        return metrics

    return eval_step
