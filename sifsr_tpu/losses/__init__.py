"""Training objectives for the three published recipes."""

from sifsr_tpu.losses.losses import (
    huber,
    ds_loss,
    percep_loss_predef,
    percep_loss_gradftm,
    sif_loss_predef,
    sif_loss_gradftm,
    scale_invariance_loss,
)
