"""sifsr_tpu — TPU-native Scale-Invariance-Free LST Super-Resolution framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
`cgranerob/Land-Surface-Temperature-Super-Resolution-with-a-Scale-Invariance-Free-Neural-Approach`
(reference mounted read-only at /root/reference).

Subpackages
-----------
ops        pure-JAX numerics: cv2/torch-exact bicubic resampling, PSF/MTF sensor
           model, norm-L4 pooling, Sobel filter banks, Fourier spectra
models     ModelB U-Net (flax linen, NHWC) + torch-checkpoint converter + VGG16
losses     the three training objectives (predef-filters, gradFTM, scale-invariance)
train      jitted train step, optax Adam, early-stopping checkpointing (orbax)
data       manifest-driven datasets, normalization statistics, host->device pipeline
parallel   jax.sharding Mesh utilities, data-parallel pjit train/infer steps
geo        GeoTIFF I/O, MODIS sinusoidal / UTM projection math, warping (no GDAL)
eval       batched TPU metrics (PSNR/SSIM/GSSIM/LPIPS/spectral) + ASTER harness
baselines  bicubic, TsHARP, ATPRK, AATPRK, DMS classical sharpeners
cli        user-facing entry points mirroring the reference's scripts
"""

__version__ = "0.1.0"
