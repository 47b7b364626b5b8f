"""Config presets — the ``deps/score_sde_pytorch/configs/`` tree as one
dataclass registry.

The reference composes ``get_default_configs()``
(``configs/default_cifar10_configs.py:5-72``) with 39 per-experiment
override files under ``configs/{vp,ve,subvp}/``.  All 39 are represented
here: :mod:`naturaldiffusion_tpu.configs_zoo` holds the extracted values
(verified field-by-field against the reference tree by
``tests/test_configs_zoo.py``) and this module lifts them into typed
:class:`ExperimentConfig` presets.  ``get_config(name)`` is the lookup;
names are the reference-relative paths (``vp/cifar10_ddpmpp_continuous``).

The first-party scripts' hard-coded module globals ("to do: set path") are
replaced by explicit CLI flags in :mod:`naturaldiffusion_tpu.apps`.
"""

from __future__ import annotations

import dataclasses

from .configs_zoo import ZOO
from .models.ncsnpp import NCSNppConfig
from .models.ddpm import DDPMConfig
from .models.ncsnv2 import NCSNv2Config


@dataclasses.dataclass(frozen=True)
class TrainingConfig:
    sde: str = "vpsde"                  # vpsde | subvpsde | vesde
    continuous: bool = True
    n_iters: int = 1_300_001
    batch_size: int = 128
    snapshot_freq: int = 50_000
    snapshot_freq_for_preemption: int = 10_000
    likelihood_weighting: bool = False
    reduce_mean: bool = True
    lr: float = 2e-4
    warmup: int = 5000
    grad_clip: float = 1.0              # <0 = no clipping (ncsn/ncsnv2)
    ema_rate: float = 0.9999
    # SDE hyperparameters (reference keeps them under model.*)
    beta_min: float = 0.1
    beta_max: float = 20.0
    sigma_min: float = 0.01
    sigma_max: float = 50.0
    num_scales: int = 1000


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    method: str = "pc"                  # pc | ode
    predictor: str = "euler_maruyama"
    corrector: str = "none"
    snr: float = 0.16
    n_steps_each: int = 1
    noise_removal: bool = True
    probability_flow: bool = False


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "cifar10"
    image_size: int = 32
    num_channels: int = 3
    centered: bool = True
    random_flip: bool = True


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str
    model_family: str                   # registry name (models._MODELS)
    model: object
    training: TrainingConfig
    sampling: SamplingConfig
    data: DataConfig = DataConfig()


_MODEL_CFG = {
    "ncsnpp": NCSNppConfig,
    "ddpm": DDPMConfig,
    "ncsn": NCSNv2Config,
    "ncsnv2_64": NCSNv2Config,
    "ncsnv2_128": NCSNv2Config,
    "ncsnv2_256": NCSNv2Config,
}


def _build(name: str, entry: dict) -> ExperimentConfig:
    family = entry["family"]
    model = _MODEL_CFG[family](**entry["model"])
    return ExperimentConfig(
        name=name,
        model_family=family,
        model=model,
        training=TrainingConfig(**entry["training"]),
        sampling=SamplingConfig(**entry["sampling"]),
        data=DataConfig(**entry["data"]),
    )


CONFIGS: dict[str, ExperimentConfig] = {
    name: _build(name, entry) for name, entry in ZOO.items()
}


def get_config(name: str) -> ExperimentConfig:
    return CONFIGS[name]
