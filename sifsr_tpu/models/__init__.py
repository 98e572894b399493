"""Model zoo: the ModelB U-Net (flax linen, NHWC) and conversion utilities."""

from sifsr_tpu.models.unet import ModelB2
from sifsr_tpu.models.convert import convert_torch_state_dict, load_torch_checkpoint
