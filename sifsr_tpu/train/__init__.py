"""Training: jitted train/eval steps, Adam, early stopping, orbax checkpoints."""

from sifsr_tpu.train.state import SifTrainState, create_train_state
from sifsr_tpu.train.step import make_train_step, make_eval_step
from sifsr_tpu.train.early_stopping import EarlyStopping
from sifsr_tpu.train.loop import train_loop
