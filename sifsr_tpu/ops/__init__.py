"""Pure-JAX numerics for the SIF-SR pipeline.

Every op here is a stateless function on jnp arrays, designed so the whole
loss/inference graph compiles into a single XLA program:

- resize:   cv2/torch-exact separable bicubic + align_corners bilinear, built as
            precomputed 1-D resampling matrices applied with MXU matmuls.
- psf:      Gaussian PSF/MTF sensor model (reference utils.py:1615-1894) with the
            full pad->conv->decimate->crop chain collapsed into per-axis matrices.
- pooling:  norm-L4 block pooling (reference utils.py:183-213), average pooling.
- filters:  the 4-direction Sobel bank of train_model_B_predef_filters.py:38-42.
- spectra:  radially-averaged Fourier attenuation spectra + FRR-family metrics
            (reference utils.py:598-662).
"""

from sifsr_tpu.ops.resize import (
    resize_matrix,
    cubic_resize,
    upsample_bicubic,
    downsample_bicubic,
    upsample_bilinear_x2,
)
from sifsr_tpu.ops.psf import (
    generate_psf_kernel,
    psf_kernel_1d,
    downscale_matrix,
    lowpass_matrix,
    downscale_lst_sr_to_lr,
    downscale_lst_sr_to_lr_test,
    lowpass_ftm,
)
from sifsr_tpu.ops.pooling import norm_l4_downsample, avg_pool_2x2
from sifsr_tpu.ops.filters import sobel_bank, directional_gradients
