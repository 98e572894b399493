"""Early stopping with best-state capture — reference utils.model_checkpoint
(utils.py:667-714) semantics, as a small host-side object.

Behavioural parity details:
- improvement means the monitored value is STRICTLY lower than the best;
  a tie counts against patience (reference uses ``>=`` at utils.py:688);
- the first epoch always captures state but does NOT reset patience counters
  (it runs the ``curr_epoch == 1`` branch);
- training stops when curr_patience >= patience, or when max epochs is hit
  with a nonzero patience counter.
"""

from __future__ import annotations

from typing import Any

import jax

__all__ = ["EarlyStopping"]


class EarlyStopping:
    def __init__(self, n_epochs: int, patience: int = 5):
        self.patience = patience
        self.curr_patience = 0
        self.saved_state: Any = None
        self.saved_best_value: float | None = None
        self.best_epoch: int | None = None
        self.max_epochs = n_epochs
        self.should_stop = False

    def update(self, epoch: int, value: float, state: Any) -> None:
        """Record epoch ``epoch`` (1-based) with monitored ``value``; snapshot
        ``state`` (a pytree — copied to host to free device memory) if best."""
        if epoch == 1:
            self.best_epoch = epoch
            self.saved_state = jax.device_get(state)
            self.saved_best_value = value
            return
        if value >= self.saved_best_value:
            self.curr_patience += 1
            if self.curr_patience >= self.patience:
                self.should_stop = True
            elif self.curr_patience > 0 and epoch == self.max_epochs:
                self.should_stop = True
        else:
            self.best_epoch = epoch
            self.curr_patience = 0
            self.saved_best_value = value
            self.saved_state = jax.device_get(state)
