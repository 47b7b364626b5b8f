"""The original DDPM UNet (Flax, NHWC).

Rebuild of ``deps/score_sde_pytorch/models/ddpm.py:40-181`` — the simpler
pre-NCSN++ architecture: fixed 32-group GroupNorm, non-rescaled skips,
zero-init second conv, plain nearest/avg-pool resampling.  Same flat
``m{i}`` module walk as the torch original, so checkpoints convert with the
shared machinery.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import NIN, default_init, get_timestep_embedding, conv3x3


def _gn32(name=None):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=name)


class ResnetBlockDDPM(nn.Module):
    """(reference ``models/layers.py:619-660``)."""
    out_ch: int | None = None
    conv_shortcut: bool = False
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, temb=None, *, deterministic: bool = True):
        act = nn.silu
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = act(_gn32(name="GroupNorm_0")(x))
        h = conv3x3(out_ch, name="Conv_0")(h)
        if temb is not None:
            h = h + nn.Dense(out_ch, kernel_init=default_init(),
                             name="Dense_0")(act(temb))[:, None, None, :]
        h = act(_gn32(name="GroupNorm_1")(h))
        h = nn.Dropout(self.dropout, deterministic=deterministic,
                       name="Dropout_0")(h)
        h = conv3x3(out_ch, init_scale=0.0, name="Conv_1")(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = conv3x3(out_ch, name="Conv_2")(x)
            else:
                x = NIN(out_ch, name="NIN_0")(x)
        return x + h


class AttnBlock(nn.Module):
    """(reference ``models/layers.py:558-581``) — no skip rescale."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = _gn32(name="GroupNorm_0")(x)
        q = NIN(c, name="NIN_0")(y).reshape(b, h * w, c)
        k = NIN(c, name="NIN_1")(y).reshape(b, h * w, c)
        v = NIN(c, name="NIN_2")(y).reshape(b, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) / math.sqrt(c), axis=-1)
        y = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        return x + NIN(c, init_scale=0.0, name="NIN_3")(y)


@dataclasses.dataclass(frozen=True)
class DDPMConfig:
    image_size: int = 32
    num_channels: int = 3
    nf: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.1
    resamp_with_conv: bool = True
    conditional: bool = True
    centered: bool = True
    scale_by_sigma: bool = False
    # geometric sigma table for scale_by_sigma (reference get_sigmas,
    # models/utils.py:50)
    sigma_min: float = 0.01
    sigma_max: float = 50.0
    num_scales: int = 1000


class DDPM(nn.Module):
    config: DDPMConfig
    sigmas: tuple = ()

    @nn.compact
    def __call__(self, x, labels, *, train: bool = False):
        cfg = self.config
        act = nn.silu
        nf = cfg.nf
        nres = len(cfg.ch_mult)

        counter = iter(range(10_000))

        def idx():
            return next(counter)

        def res(h, temb, **kw):
            return ResnetBlockDDPM(dropout=cfg.dropout, name=f"m{idx()}",
                                   **kw)(h, temb, deterministic=not train)

        if cfg.conditional:
            temb = get_timestep_embedding(labels, nf)
            temb = nn.Dense(nf * 4, kernel_init=default_init(),
                            name=f"m{idx()}")(temb)
            temb = nn.Dense(nf * 4, kernel_init=default_init(),
                            name=f"m{idx()}")(act(temb))
        else:
            temb = None

        h = x if cfg.centered else 2 * x - 1.0
        hs = [conv3x3(nf, name=f"m{idx()}")(h)]
        in_ch = nf
        for i_level in range(nres):
            for _ in range(cfg.num_res_blocks):
                out_ch = nf * cfg.ch_mult[i_level]
                h = res(hs[-1], temb, out_ch=out_ch)
                in_ch = out_ch
                if h.shape[1] in cfg.attn_resolutions:
                    h = AttnBlock(name=f"m{idx()}")(h)
                hs.append(h)
            if i_level != nres - 1:
                y = hs[-1]
                if cfg.resamp_with_conv:
                    y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
                    y = conv3x3(in_ch, stride=2, padding="VALID",
                                name=f"m{idx()}_Conv_0")(y)
                else:
                    y = nn.avg_pool(y, (2, 2), strides=(2, 2))
                    idx()   # keep module numbering aligned with torch
                hs.append(y)

        h = hs[-1]
        h = res(h, temb)
        h = AttnBlock(name=f"m{idx()}")(h)
        h = res(h, temb)

        for i_level in reversed(range(nres)):
            for _ in range(cfg.num_res_blocks + 1):
                out_ch = nf * cfg.ch_mult[i_level]
                h = res(jnp.concatenate([h, hs.pop()], axis=-1), temb,
                        out_ch=out_ch)
                in_ch = out_ch
            if h.shape[1] in cfg.attn_resolutions:
                h = AttnBlock(name=f"m{idx()}")(h)
            if i_level != 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                if cfg.resamp_with_conv:
                    h = conv3x3(c, name=f"m{idx()}_Conv_0")(h)
                else:
                    idx()

        assert not hs
        h = act(_gn32(name=f"m{idx()}")(h))
        h = conv3x3(cfg.num_channels, init_scale=0.0, name=f"m{idx()}")(h)

        if cfg.scale_by_sigma:
            if self.sigmas:
                sigmas = jnp.asarray(self.sigmas, x.dtype)
            else:
                import numpy as np
                sigmas = jnp.exp(jnp.linspace(np.log(cfg.sigma_max),
                                              np.log(cfg.sigma_min),
                                              cfg.num_scales))
            used = sigmas[labels.astype(jnp.int32)]
            h = h / used.reshape(-1, 1, 1, 1)
        return h


def ddpm_torch_path_map(path: tuple[str, ...]) -> str:
    """m{i} -> all_modules.{i}; the resampling convs live INSIDE
    Upsample/Downsample modules in torch (``all_modules.{i}.Conv_0``)."""
    parts = []
    for seg in path:
        if seg.startswith("m") and seg[1:].split("_")[0].isdigit():
            rest = seg[1:].split("_", 1)
            parts.extend(["all_modules", rest[0]])
            if len(rest) > 1:
                parts.append(rest[1])
        else:
            parts.append(seg)
    return ".".join(parts)
