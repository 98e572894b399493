"""Typed configuration, unifying the reference's params JSON + script globals.

The reference configures training through paramsB.json (read by
utils.read_JsonB, utils.py:741-764) and evaluation through module-level
variables edited in place (model_perf_aster_formatds.py:65-80). Here a single
frozen dataclass tree covers both, with a loader that accepts the reference's
exact JSON schema so existing param files keep working.
"""

from __future__ import annotations

import dataclasses
import json
from collections.abc import Sequence

__all__ = ["DatasetConfig", "ModelConfig", "HyperParams", "SaveConfig", "TrainConfig", "load_params_json"]


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    time: str = "day"            # 'day' | 'night' | 'Both'
    transf: str = "norm"         # 'norm' | '0-1' | '-1_1'
    csv_path: str = "data/ModisDatasetB.csv"
    statistics_path: str = "data/statistics.json"


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    in_channels: int = 2
    downchannels: Sequence[int] = (16, 32, 64, 128)
    padding_mode: str = "replicate"
    activation: str = "ReLU"
    bilinear: bool = True
    n_bridge_blocks: int = 1     # accepted for JSON compat; unused (like the reference)


@dataclasses.dataclass(frozen=True)
class HyperParams:
    batch_size: int = 8
    learning_rate: float = 1e-3
    n_epochs: int = 200
    patience: int = 30
    alpha: float = 0.1
    gamma: float = -0.4


@dataclasses.dataclass(frozen=True)
class SaveConfig:
    model_name: str = "modelB"
    save_path: str = "./models/modelB_test"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    dataset: DatasetConfig = DatasetConfig()
    model: ModelConfig = ModelConfig()
    hyper: HyperParams = HyperParams()
    save: SaveConfig = SaveConfig()
    recipe: str = "predef_filters"  # 'predef_filters' | 'gradftm' | 'scale_invariance'
    seed: int = 0
    # parallelism: data-parallel shards over this many devices (0 = all local)
    n_devices: int = 0
    # matmul/conv precision: 'highest' = f32 accumulation (torch parity);
    # 'default' = single-pass bf16 MXU issue on f32 data;
    # 'bf16' = full mixed precision (bf16 activations, f32 master weights,
    # f32 BatchNorm statistics, f32 Adam) — the fast training configuration
    precision: str = "highest"
    # per-step on-device PSNR/SSIM (the reference computes them per batch;
    # disabling buys ~35% step time)
    step_metrics: bool = True
    # conv padding implementation: 'explicit' = materialised edge-pad +
    # VALID conv (bit-exact reference parity); 'fused' = zero-SAME conv +
    # border-ring correction (models.unet.Conv3x3) — skips the padded-input
    # copies that dominate train-step HBM traffic (~1.7x bf16 throughput),
    # interior bit-identical, border differs by summation order (~1 ulp)
    pad_impl: str = "explicit"
    # rematerialise the forward+loss graph in the backward pass
    # (jax.checkpoint): drops all forward activations from HBM between the
    # forward and backward phases at the cost of ~one extra forward — lifts
    # the activation-memory ceiling on batch size. Numerics are identical.
    remat: bool = False


def load_params_json(path: str, recipe: str = "predef_filters") -> TrainConfig:
    """Load a reference-format paramsB.json into a TrainConfig.

    Field names/sections follow the reference schema exactly
    (paramsB.json / SURVEY.md §2 #19); unknown sections (modelA_parameters,
    device) are ignored — device placement is JAX's job here.
    """
    with open(path) as f:
        data = json.load(f)
    ds = data.get("dataset_parameter", {})
    hp = data.get("hyperparameters", {})
    mp = data.get("modelB_parameters", {})
    sp = data.get("save_parameters", {})
    return TrainConfig(
        dataset=DatasetConfig(
            time=ds.get("time", "day"),
            transf=ds.get("transf", "norm"),
        ),
        model=ModelConfig(
            in_channels=mp.get("in_channels", 2),
            downchannels=tuple(mp.get("downchannels", (16, 32, 64, 128))),
            padding_mode=mp.get("padding_mode", "replicate"),
            activation=mp.get("activation", "ReLU"),
            bilinear=bool(mp.get("bilinear", True)),
            n_bridge_blocks=mp.get("n_bridge_blocks", 1),
        ),
        hyper=HyperParams(
            batch_size=hp.get("batch_size", 8),
            learning_rate=hp.get("learning_rate", 1e-3),
            n_epochs=hp.get("n_epochs", 200),
            patience=hp.get("patience", 30),
            alpha=hp.get("alpha", 0.1),
            gamma=hp.get("gamma", -0.4),
        ),
        save=SaveConfig(
            model_name=sp.get("model_name", "modelB"),
            save_path=sp.get("save_path", "./models/modelB_test"),
        ),
        recipe=recipe,
    )
