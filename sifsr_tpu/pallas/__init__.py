"""Hand-written Pallas TPU kernels for ops XLA doesn't fuse optimally."""

from sifsr_tpu.pallas.fused_ops import fused_psf_downscale, fused_norm_l4
