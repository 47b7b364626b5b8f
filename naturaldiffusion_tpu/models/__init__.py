"""Model registry — ``deps/score_sde_pytorch/models/utils.py:24-96``
(``register_model`` / ``create_model``) plus the transformer/VAE families.

``create_model(name, config)`` instantiates by registry name;
``get_model_fn``/``get_score_fn`` equivalents live in
:mod:`naturaldiffusion_tpu.sde` (label conventions included).
"""

from .ncsnpp import NCSNpp, NCSNppConfig, CIFAR10_DDPMPP_CONTINUOUS
from .ddpm import DDPM, DDPMConfig
from .ncsnv2 import (NCSNv2, NCSNv2_128, NCSNv2_256, NCSN,
                     NCSNv2Config)
from .dit import DiT, DiTConfig, DIT_CONFIGS, forward_with_cfg
from .mmdit import MMDiT, MMDiTConfig, SD3_MEDIUM
from .vae import AutoencoderKL, VAEConfig, SD_VAE, SD3_VAE
from . import convert

_MODELS = {
    "ncsnpp": (NCSNpp, NCSNppConfig),
    "ddpm": (DDPM, DDPMConfig),
    "ncsnv2_64": (NCSNv2, NCSNv2Config),
    "ncsnv2_128": (NCSNv2_128, NCSNv2Config),
    "ncsnv2_256": (NCSNv2_256, NCSNv2Config),
    "ncsn": (NCSN, NCSNv2Config),
    "dit": (DiT, DiTConfig),
    "mmdit": (MMDiT, MMDiTConfig),
    "vae": (AutoencoderKL, VAEConfig),
}


def register_model(name: str):
    def deco(pair):
        _MODELS[name] = pair
        return pair
    return deco


def get_model(name: str):
    return _MODELS[name]


def create_model(name: str, config=None, **config_kwargs):
    cls, cfg_cls = _MODELS[name]
    cfg = config if config is not None else cfg_cls(**config_kwargs)
    return cls(config=cfg)


__all__ = [
    "NCSNpp", "NCSNppConfig", "CIFAR10_DDPMPP_CONTINUOUS",
    "DDPM", "DDPMConfig", "NCSNv2", "NCSNv2_128", "NCSNv2_256", "NCSN",
    "NCSNv2Config",
    "DiT", "DiTConfig", "DIT_CONFIGS", "forward_with_cfg",
    "MMDiT", "MMDiTConfig", "SD3_MEDIUM",
    "AutoencoderKL", "VAEConfig", "SD_VAE", "SD3_VAE",
    "convert", "register_model", "get_model", "create_model",
]
