"""AutoencoderKL — the SD VAE (Flax, NHWC), HF-checkpoint-compatible.

The reference uses diffusers' ``AutoencoderKL`` in three places: DiT latent
decode (``src/ValidateNaturalInference.py:331``), SD3 decode
(``src/SD3NaturalInference.py:225-243``) and the degradation study's feature
encoder (``src/AnalyzeWeightedSumDegradation.py:37-63``).  This is the
standard SD VAE architecture (resnet blocks, one mid attention, 2x
up/downsampling); parameter names mirror the HF ``vae`` layout via
:func:`vae_torch_path_map`.

Configs: SD 1.x/2.x/DiT VAE (4 latent channels, scaling 0.18215) and SD3
(16 channels, scaling 1.5305, shift 0.0609).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    base_channels: int = 128
    ch_mult: tuple = (1, 2, 4, 4)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0


SD_VAE = VAEConfig()                                      # DiT / SD1-2
SD3_VAE = VAEConfig(latent_channels=16, scaling_factor=1.5305,
                    shift_factor=0.0609)


def _gn(name=None):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=name)


class ResnetBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.silu(_gn(name="norm1")(x))
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="conv1")(h)
        h = nn.silu(_gn(name="norm2")(h))
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = _gn(name="group_norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q")(y)
        k = nn.Dense(c, name="to_k")(y)
        v = nn.Dense(c, name="to_v")(y)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(c), axis=-1)
        y = jnp.einsum("bqk,bkc->bqc", attn, v)
        y = nn.Dense(c, name="to_out_0")(y).reshape(b, h, w, c)
        return x + y


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        ch = cfg.base_channels
        h = nn.Conv(ch, (3, 3), padding="SAME", name="conv_in")(x)
        for i, mult in enumerate(cfg.ch_mult):
            out_ch = ch * mult
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(out_ch,
                                name=f"down_blocks_{i}_resnets_{j}")(h)
            if i != len(cfg.ch_mult) - 1:
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding="VALID",
                            name=f"down_blocks_{i}_downsamplers_0_conv")(h)
        mid = ch * cfg.ch_mult[-1]
        h = ResnetBlock(mid, name="mid_block_resnets_0")(h)
        h = AttnBlock(name="mid_block_attentions_0")(h)
        h = ResnetBlock(mid, name="mid_block_resnets_1")(h)
        h = nn.silu(_gn(name="conv_norm_out")(h))
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding="SAME",
                       name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        ch = cfg.base_channels
        mults = list(reversed(cfg.ch_mult))
        mid = ch * mults[0]
        h = nn.Conv(mid, (3, 3), padding="SAME", name="conv_in")(z)
        h = ResnetBlock(mid, name="mid_block_resnets_0")(h)
        h = AttnBlock(name="mid_block_attentions_0")(h)
        h = ResnetBlock(mid, name="mid_block_resnets_1")(h)
        for i, mult in enumerate(mults):
            out_ch = ch * mult
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(out_ch, name=f"up_blocks_{i}_resnets_{j}")(h)
            if i != len(mults) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = nn.Conv(out_ch, (3, 3), padding="SAME",
                            name=f"up_blocks_{i}_upsamplers_0_conv")(h)
        h = nn.silu(_gn(name="conv_norm_out")(h))
        return nn.Conv(cfg.in_channels, (3, 3), padding="SAME",
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    config: VAEConfig = SD_VAE

    def setup(self):
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")
        # SD 1.x/2.x VAEs have 1x1 quant/post-quant convs; SD3 drops them —
        # keep them (identity-initialized) and skip missing keys on convert
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       name="post_quant_conv")

    def encode(self, x, key=None):
        """Returns (mean, logvar) or a sample when ``key`` is given;
        [B,H,W,C] in [-1,1] -> [B,H/8,W/8,latent]."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if key is None:
            return mean, logvar
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        return mean + std * jax.random.normal(key, mean.shape)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key=None):
        z = self.encode(x, key=key if key is not None else None)
        if isinstance(z, tuple):
            z = z[0]
        return self.decode(z)

    # latent <-> model-space scaling (reference: z/0.18215 before decode,
    # src/ValidateNaturalInference.py:368; SD3: z/1.5305 + 0.0609,
    # src/SD3NaturalInference.py:240-241)
    def scale_latents(self, z):
        return (z - self.config.shift_factor) * self.config.scaling_factor

    def unscale_latents(self, z):
        return z / self.config.scaling_factor + self.config.shift_factor


def vae_torch_path_map(path: tuple[str, ...]) -> str:
    parts = []
    for seg in path:
        for pref in ("down_blocks_", "up_blocks_", "mid_block_resnets_",
                     "mid_block_attentions_"):
            if seg.startswith(pref):
                # down_blocks_0_resnets_1 -> down_blocks.0.resnets.1 etc.
                seg = seg.replace("_resnets_", ".resnets.") \
                    .replace("_attentions_", ".attentions.") \
                    .replace("_downsamplers_0_conv", ".downsamplers.0.conv") \
                    .replace("_upsamplers_0_conv", ".upsamplers.0.conv")
                seg = seg.replace("down_blocks_", "down_blocks.") \
                    .replace("up_blocks_", "up_blocks.") \
                    .replace("mid_block.resnets.", "mid_block.resnets.") \
                    .replace("mid_block_", "mid_block.")
                break
        if seg == "to_out_0":
            seg = "to_out.0"
        parts.append(seg)
    return ".".join(parts)
