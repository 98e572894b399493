"""The scale-invariance-free training objectives, as one fused XLA graph each.

Three recipes (SURVEY.md §2 #14-16):

SIF-NN-SR1 (train_model_B_predef_filters.py:100-133):
    loss = α·Huber(renorm(downscale(unnorm(SR))), LST)
         + (1-α)·Huber(sobel_bank(SR), γ·sobel_bank(NDVI))

SIF-NN-SR2 (train_model_B_gradFTM.py:88-117):
    high-frequency residuals vs a PSF low-pass (mtf=0.25) instead of Sobel:
    loss = α·ds_loss + (1-α)·Huber(SR - lowpass(SR), γ·(NDVI - lowpass(NDVI)))

SC-Unet (train_model_B_scale_invariance.py:88-103):
    loss = Huber(SR, LST_1km)     (pure reconstruction at 64×64)

All functions take NHWC batches with a single channel and are differentiable
end-to-end; the PSF downscale/low-pass enter as precomputed per-axis matrices
(see ops.psf) so each whole objective compiles into matmuls + elementwise work
that XLA fuses with the model's backward pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from sifsr_tpu.ops.filters import directional_gradients
from sifsr_tpu.ops.psf import downscale_lst_sr_to_lr, lowpass_ftm

__all__ = [
    "huber",
    "ds_loss",
    "percep_loss_predef",
    "percep_loss_gradftm",
    "sif_loss_predef",
    "sif_loss_gradftm",
    "scale_invariance_loss",
]


def huber(pred: jnp.ndarray, target: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    """torch.nn.HuberLoss(reduction='mean', delta=1.0) parity."""
    err = pred - target
    abs_err = jnp.abs(err)
    quad = 0.5 * err * err
    lin = delta * (abs_err - 0.5 * delta)
    return jnp.mean(jnp.where(abs_err < delta, quad, lin))


def _nhwc_to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x, -1, 1)


def _nchw_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x, 1, -1)


def ds_loss(
    sr: jnp.ndarray,
    lst: jnp.ndarray,
    mean_lst: float,
    std_lst: float,
    factor: int = 4,
    mtf: float = 0.1,
    use_pallas: bool | None = None,
    mesh=None,
    axis_name: str = "data",
) -> jnp.ndarray:
    """Reconstruction loss: un-normalise the SR patch, degrade it through the
    sensor PSF model back to input resolution, re-normalise, Huber vs the
    input LST (train_model_B_predef_filters.py:110-118).

    On TPU the whole unnorm->degrade->renorm chain runs as one fused Pallas
    kernel (~13x faster than the XLA matmul chain, with a custom linear VJP);
    elsewhere the per-axis matmul path is used.

    Multi-chip: the degradation is strictly per-image, so under a mesh the
    kernel is shard_mapped over the batch axis (``mesh``/``axis_name`` — pass
    the training mesh from make_train_step). Without a mesh the pallas path
    auto-enables only on single-chip TPU; the matmul path partitions itself.
    """
    import jax

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and (
            mesh is not None or jax.device_count() == 1
        )
    if use_pallas:
        from sifsr_tpu.pallas.fused_ops import fused_psf_downscale

        def degrade(x):
            return fused_psf_downscale(
                x, float(mean_lst), float(std_lst), factor=factor, mtf=mtf
            )

        if mesh is not None and mesh.size > 1:
            from jax.sharding import PartitionSpec as P

            spec = P(axis_name)
            # check_vma=False: pallas_call outputs carry no vma annotation
            degrade = jax.shard_map(degrade, mesh=mesh, in_specs=spec,
                                    out_specs=spec, check_vma=False)
        down = degrade(sr[..., 0])[..., None]
        return huber(down, lst)
    sr_unnorm = sr * std_lst + mean_lst
    down = downscale_lst_sr_to_lr(_nhwc_to_nchw(sr_unnorm), factor=factor, mtf=mtf)
    down = (down - mean_lst) / std_lst
    return huber(_nchw_to_nhwc(down), lst)


def percep_loss_predef(sr: jnp.ndarray, ndvi: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Sobel-bank perceptual loss (train_model_B_predef_filters.py:120-130);
    γ < 0 encodes the LST/NDVI anticorrelation."""
    return huber(directional_gradients(sr), gamma * directional_gradients(ndvi))


def percep_loss_gradftm(
    sr: jnp.ndarray, ndvi: jnp.ndarray, gamma: float, mtf: float = 0.25
) -> jnp.ndarray:
    """Gradient-FTM perceptual loss (train_model_B_gradFTM.py:108-114):
    high frequencies = x - PSF-lowpass(x, mtf)."""
    hf_sr = sr - _nchw_to_nhwc(lowpass_ftm(_nhwc_to_nchw(sr), mtf=mtf))
    hf_ndvi = ndvi - _nchw_to_nhwc(lowpass_ftm(_nhwc_to_nchw(ndvi), mtf=mtf))
    return huber(hf_sr, gamma * hf_ndvi)


def sif_loss_predef(
    sr: jnp.ndarray,
    lst: jnp.ndarray,
    ndvi: jnp.ndarray,
    alpha: float,
    gamma: float,
    mean_lst: float,
    std_lst: float,
    mesh=None,
    axis_name: str = "data",
) -> tuple[jnp.ndarray, dict]:
    dsl = ds_loss(sr, lst, mean_lst, std_lst, mesh=mesh, axis_name=axis_name)
    pl = percep_loss_predef(sr, ndvi, gamma)
    total = alpha * dsl + (1.0 - alpha) * pl
    return total, {"ds_loss": dsl, "percep_loss": pl}


def sif_loss_gradftm(
    sr: jnp.ndarray,
    lst: jnp.ndarray,
    ndvi: jnp.ndarray,
    alpha: float,
    gamma: float,
    mean_lst: float,
    std_lst: float,
    mesh=None,
    axis_name: str = "data",
) -> tuple[jnp.ndarray, dict]:
    dsl = ds_loss(sr, lst, mean_lst, std_lst, mesh=mesh, axis_name=axis_name)
    pl = percep_loss_gradftm(sr, ndvi, gamma)
    total = alpha * dsl + (1.0 - alpha) * pl
    return total, {"ds_loss": dsl, "percep_loss": pl}


def scale_invariance_loss(sr: jnp.ndarray, lst_1km: jnp.ndarray) -> tuple[jnp.ndarray, dict]:
    total = huber(sr, lst_1km)
    return total, {}
