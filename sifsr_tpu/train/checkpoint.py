"""Orbax checkpointing with mid-training resume.

Upgrades the reference's persistence story (SURVEY.md §5): the reference only
keeps the best state_dict in memory and writes once at the very end
(utils.py:667-714, 802-826) — a crash loses the whole run. Here every epoch
persists {params, batch_stats, opt_state, epoch, early-stopping state,
metrics} through orbax, and training resumes from the latest step.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "save_final", "load_final"]


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for epoch-granular resume."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save_epoch(self, epoch: int, state, extra: dict, best_state=None) -> None:
        """Persist the train state, the best-so-far snapshot, and host-side
        bookkeeping after ``epoch``."""
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        kwargs = dict(
            state=ocp.args.StandardSave(payload),
            extra=ocp.args.JsonSave(extra),
        )
        if best_state is not None:
            kwargs["best"] = ocp.args.StandardSave(best_state)
        self._mgr.save(epoch, args=ocp.args.Composite(**kwargs))
        # block until serialized: the train step donates its input state, so
        # the next epoch would otherwise invalidate buffers an async orbax
        # save is still reading
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> int | None:
        return self._mgr.latest_step()

    def restore_epoch(self, epoch: int, state):
        """Restore into the shape of ``state``; returns (state, extra, best).

        ``best`` is {'params', 'batch_stats'} of the best-so-far epoch (or
        None when the checkpoint predates any improvement snapshot)."""
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        best_template = {"params": state.params, "batch_stats": state.batch_stats}
        kwargs = dict(
            state=ocp.args.StandardRestore(template),
            extra=ocp.args.JsonRestore(),
        )
        # 'best' is absent when the checkpoint was written before any
        # val-loss improvement snapshot existed — restore must not require it
        if "best" in self._mgr.item_metadata(epoch):
            kwargs["best"] = ocp.args.StandardRestore(best_template)
        restored = self._mgr.restore(epoch, args=ocp.args.Composite(**kwargs))
        new_state = state.replace(
            params=restored["state"]["params"],
            batch_stats=restored["state"]["batch_stats"],
            opt_state=restored["state"]["opt_state"],
            step=restored["state"]["step"],
        )
        return new_state, restored["extra"], restored.get("best")

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_final(save_path: str, model_name: str, state, metrics: dict, params_json: dict | None = None) -> None:
    """Final experiment persistence mirroring the reference layout
    (utils.save_model + metrics pkl + params copy,
    train_model_B_predef_filters.py:497-514):

        <save_path>/<model_name>_variables.msgpack   (flax serialized weights)
        <save_path>/<model_name>_lossdata.pkl        (same dict schema)
        <save_path>/<model_name>_train_params.json
    """
    from flax import serialization

    os.makedirs(save_path, exist_ok=True)
    variables = {"params": jax.device_get(state.params), "batch_stats": jax.device_get(state.batch_stats)}
    with open(os.path.join(save_path, f"{model_name}_variables.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(variables))
    with open(os.path.join(save_path, f"{model_name}_lossdata.pkl"), "wb") as f:
        pickle.dump(metrics, f)
    if params_json is not None:
        with open(os.path.join(save_path, f"{model_name}_train_params.json"), "w") as f:
            json.dump(params_json, f, indent=1)


def load_final(save_path: str, model_name: str, template: Any) -> dict:
    """Load variables saved by save_final into the structure of ``template``."""
    from flax import serialization

    with open(os.path.join(save_path, f"{model_name}_variables.msgpack"), "rb") as f:
        return serialization.from_bytes(template, f.read())
