"""Batched, jittable evaluation metrics + the ASTER evaluation harness."""

from sifsr_tpu.eval.metrics import (
    psnr,
    psnr_batch_mean,
    ssim,
    ssim_batch_mean,
    gssim,
    rmse,
    gradient_rmse,
    stratified_rmse,
)
from sifsr_tpu.eval.spectra import (
    attenuation_spectrum,
    pfr,
    afr,
    frr,
    fro,
    fru,
)
