"""Config presets — the ``deps/score_sde_pytorch/configs/`` tree as one
dataclass registry.

The reference composes ``get_default_configs()``
(``configs/default_cifar10_configs.py:5-72``) with ~40 per-experiment
override files; the one its experiments actually load is
``configs/vp/cifar10_ddpmpp_continuous.py:22-66``.  Here a preset is a
:class:`ExperimentConfig` value in ``CONFIGS``; ``get_config(name)`` is the
lookup.  The first-party scripts' hard-coded module globals ("to do: set
path") are replaced by explicit CLI flags in :mod:`naturaldiffusion_tpu.apps`.
"""

from __future__ import annotations

import dataclasses

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
    grad_clip: float = 1.0
    ema_rate: float = 0.9999


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    method: str = "pc"                  # pc | ode
    predictor: str = "euler_maruyama"
    corrector: str = "none"
    snr: float = 0.16
    n_steps_each: int = 1
    noise_removal: bool = True


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
    model_family: str                   # ncsnpp | ddpm
    model: object
    training: TrainingConfig
    sampling: SamplingConfig
    data: DataConfig = DataConfig()


def _ncsnpp(**kw) -> NCSNppConfig:
    return NCSNppConfig(**kw)


_VP_SAMPLING = SamplingConfig(predictor="euler_maruyama", corrector="none")
_VE_SAMPLING = SamplingConfig(predictor="reverse_diffusion",
                              corrector="langevin")

CONFIGS: dict[str, ExperimentConfig] = {
    # the checkpoint_8.pth experiment (configs/vp/cifar10_ddpmpp_continuous.py)
    "vp/cifar10_ddpmpp_continuous": ExperimentConfig(
        "vp/cifar10_ddpmpp_continuous", "ncsnpp", _ncsnpp(),
        TrainingConfig(sde="vpsde", continuous=True), _VP_SAMPLING),
    "vp/cifar10_ddpmpp": ExperimentConfig(
        "vp/cifar10_ddpmpp", "ncsnpp", _ncsnpp(),
        TrainingConfig(sde="vpsde", continuous=False,
                       reduce_mean=True), _VP_SAMPLING),
    "vp/cifar10_ddpmpp_deep_continuous": ExperimentConfig(
        "vp/cifar10_ddpmpp_deep_continuous", "ncsnpp",
        _ncsnpp(num_res_blocks=8),
        TrainingConfig(sde="vpsde", continuous=True), _VP_SAMPLING),
    "vp/ddpm/cifar10": ExperimentConfig(
        "vp/ddpm/cifar10", "ddpm", DDPMConfig(),
        TrainingConfig(sde="vpsde", continuous=False), _VP_SAMPLING),
    "subvp/cifar10_ddpmpp_continuous": ExperimentConfig(
        "subvp/cifar10_ddpmpp_continuous", "ncsnpp", _ncsnpp(),
        TrainingConfig(sde="subvpsde", continuous=True,
                       likelihood_weighting=False), _VP_SAMPLING),
    "ve/cifar10_ncsnpp_continuous": ExperimentConfig(
        "ve/cifar10_ncsnpp_continuous", "ncsnpp",
        _ncsnpp(fir=True, embedding_type="fourier", scale_by_sigma=True),
        TrainingConfig(sde="vesde", continuous=True, reduce_mean=False),
        _VE_SAMPLING),
    "ve/cifar10_ncsnpp_deep_continuous": ExperimentConfig(
        "ve/cifar10_ncsnpp_deep_continuous", "ncsnpp",
        _ncsnpp(fir=True, embedding_type="fourier", scale_by_sigma=True,
                num_res_blocks=8),
        TrainingConfig(sde="vesde", continuous=True, reduce_mean=False),
        _VE_SAMPLING),
    # 256px church/bedroom-style VE config (progressive paths exercised)
    "ve/church_ncsnpp_continuous": ExperimentConfig(
        "ve/church_ncsnpp_continuous", "ncsnpp",
        _ncsnpp(image_size=256, ch_mult=(1, 1, 2, 2, 2, 2, 2),
                num_res_blocks=2, attn_resolutions=(16,), fir=True,
                embedding_type="fourier", scale_by_sigma=True,
                progressive="output_skip", progressive_input="input_skip",
                progressive_combine="sum"),
        TrainingConfig(sde="vesde", continuous=True, reduce_mean=False,
                       batch_size=64),
        _VE_SAMPLING,
        DataConfig(dataset="church", image_size=256)),
    # reference configs/ve/celebahq_256_ncsnpp_continuous.py (sigma_max=348)
    "ve/celebahq_256_ncsnpp_continuous": ExperimentConfig(
        "ve/celebahq_256_ncsnpp_continuous", "ncsnpp",
        _ncsnpp(image_size=256, ch_mult=(1, 1, 2, 2, 2, 2, 2),
                num_res_blocks=2, attn_resolutions=(16,), fir=True,
                embedding_type="fourier", scale_by_sigma=True),
        TrainingConfig(sde="vesde", continuous=True, reduce_mean=False,
                       batch_size=64),
        _VE_SAMPLING,
        DataConfig(dataset="celebahq", image_size=256)),
    # reference configs/ve/cifar10_ddpm.py (DDPM backbone under VE)
    "ve/cifar10_ddpm": ExperimentConfig(
        "ve/cifar10_ddpm", "ddpm", DDPMConfig(scale_by_sigma=True),
        TrainingConfig(sde="vesde", continuous=False, reduce_mean=False),
        _VE_SAMPLING),
    # reference configs/ve/ncsnv2/* (SMLD + ALD sampling)
    "ve/ncsnv2/cifar10": ExperimentConfig(
        "ve/ncsnv2/cifar10", "ncsnv2_64", NCSNv2Config(),
        TrainingConfig(sde="vesde", continuous=False, reduce_mean=False,
                       ema_rate=0.999),
        SamplingConfig(predictor="none", corrector="ald", snr=0.176,
                       n_steps_each=5)),
}


def get_config(name: str) -> ExperimentConfig:
    return CONFIGS[name]
