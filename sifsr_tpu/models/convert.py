"""torch checkpoint -> flax variables converter for ModelB_2.

The reference ships three trained state dicts (models/modelB_{1009,2609,2011}/
modelB_state_dict.pt). This module maps them onto sifsr_tpu.models.ModelB2's
variable tree:

    torch OIHW conv weights        -> HWIO kernels
    BatchNorm weight/bias          -> params .../bn/{scale,bias}
    BatchNorm running_mean/var     -> batch_stats .../bn/{mean,var}

It also reproduces the reference's stale-key tolerance: keys containing
"factor" (left behind by an older model revision) are dropped on load
(reference predict.py:56-64).

torch is only needed here (conversion) and in tests; the runtime framework has
no torch dependency.
"""

from __future__ import annotations

import numpy as np

__all__ = ["convert_torch_state_dict", "load_torch_checkpoint"]

# torch Sequential index -> our submodule names inside a DoubleConvolution bloc.
_DC_LAYERS = {"0": "conv1", "1": "bn1", "3": "conv2", "4": "bn2"}


def _assign(tree: dict, path: list[str], leaf: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = leaf


def _map_key(key: str) -> tuple[list[str], str] | None:
    """Map one torch state_dict key to (flax path, kind).

    kind: 'kernel' | 'bias' | 'bn_scale' | 'bn_bias' | 'bn_mean' | 'bn_var' | None
    """
    parts = key.split(".")
    if "num_batches_tracked" in key or "factor" in key:
        return None

    def dc(prefix: list[str], seq_idx: str, param: str):
        layer = _DC_LAYERS[seq_idx]
        if layer.startswith("conv"):
            return prefix + [layer], {"weight": "kernel", "bias": "bias"}[param]
        kind = {
            "weight": "bn_scale",
            "bias": "bn_bias",
            "running_mean": "bn_mean",
            "running_var": "bn_var",
        }[param]
        return prefix + [layer], kind

    top = parts[0]
    if top == "inbloc":  # inbloc.bloc.N.param
        return dc(["inbloc"], parts[2], parts[3])
    if top in ("db1", "db2", "db3"):
        if parts[1] == "resblock":  # dbX.resblock.doubleconv.bloc.N.param
            return dc([top, "res"], parts[4], parts[5])
        if parts[1] == "lastconv":  # dbX.lastconv.N.param  (0=conv, 1=bn)
            if parts[2] == "0":
                return [top, "lastconv"], {"weight": "kernel", "bias": "bias"}[parts[3]]
            kind = {
                "weight": "bn_scale",
                "bias": "bn_bias",
                "running_mean": "bn_mean",
                "running_var": "bn_var",
            }[parts[3]]
            return [top, "lastbn"], kind
    if top in ("ub1", "ub2", "ub3"):
        if parts[1] == "up":  # ConvTranspose decoder (bilinear=False models)
            return [top, "up"], {"weight": "kernel_convT", "bias": "bias"}[parts[2]]
        return dc([top, "convbloc"], parts[3], parts[4])  # ubX.convbloc.bloc.N.param
    if top == "outlay":  # outlay.param
        return ["outlay"], {"weight": "kernel", "bias": "bias"}[parts[1]]
    raise KeyError(f"unmapped torch key: {key}")


def convert_torch_state_dict(state_dict: dict) -> dict:
    """Convert a torch ModelB_2 state_dict (tensors or ndarrays) into
    ``{'params': ..., 'batch_stats': ...}`` for ModelB2.apply."""
    params: dict = {}
    batch_stats: dict = {}
    for key, value in state_dict.items():
        mapped = _map_key(key)
        if mapped is None:
            continue
        path, kind = mapped
        arr = np.asarray(getattr(value, "numpy", lambda: value)()).astype(np.float32)
        if kind == "kernel":
            _assign(params, path + ["kernel"], arr.transpose(2, 3, 1, 0))  # OIHW->HWIO
        elif kind == "kernel_convT":
            # torch ConvTranspose2d weight is (in, out, kh, kw); flax
            # ConvTranspose is the gradient-of-conv formulation, so its
            # (kh, kw, in, out) kernel is the spatially flipped torch kernel
            flipped = arr.transpose(2, 3, 0, 1)[::-1, ::-1]
            _assign(params, path + ["kernel"], np.ascontiguousarray(flipped))
        elif kind == "bias":
            _assign(params, path + ["bias"], arr)
        elif kind == "bn_scale":
            _assign(params, path + ["scale"], arr)
        elif kind == "bn_bias":
            _assign(params, path + ["bias"], arr)
        elif kind == "bn_mean":
            _assign(batch_stats, path + ["mean"], arr)
        elif kind == "bn_var":
            _assign(batch_stats, path + ["var"], arr)
    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(path: str) -> dict:
    """Load a ``*_state_dict.pt`` file and convert it (requires torch)."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    return convert_torch_state_dict(state_dict)
