"""NCSN++ / DDPM++ UNet (Flax, NHWC).

TPU-native rebuild of ``deps/score_sde_pytorch/models/ncsnpp.py:34-381``.
The reference stores every layer in one flat ``nn.ModuleList`` and walks it
with a running index; we keep that exact walk (submodules named ``m{i}``) so a
torch checkpoint maps onto the flax tree by index — but the layers themselves
are the NHWC/XLA implementations in :mod:`.layers`.

Supported axes (all reference configs): ddpm|biggan resblocks, fir on/off,
progressive none|output_skip|residual, progressive_input
none|input_skip|residual, fourier|positional embeddings, conditional on/off,
scale_by_sigma.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L
from ..ops import upfirdn2d as firops


@dataclasses.dataclass(frozen=True)
class NCSNppConfig:
    image_size: int = 32
    num_channels: int = 3
    nf: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 2)
    num_res_blocks: int = 4
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.1
    resamp_with_conv: bool = True
    conditional: bool = True
    fir: bool = False
    fir_kernel: Sequence[int] = (1, 3, 3, 1)
    skip_rescale: bool = True
    resblock_type: str = "biggan"            # "ddpm" | "biggan"
    progressive: str = "none"                # "none"|"output_skip"|"residual"
    progressive_input: str = "none"          # "none"|"input_skip"|"residual"
    progressive_combine: str = "sum"         # "sum"|"cat"
    embedding_type: str = "positional"       # "positional"|"fourier"
    fourier_scale: float = 16.0
    init_scale: float = 0.0
    centered: bool = True
    scale_by_sigma: bool = False
    num_train_timesteps: int = 1000          # positional-embedding t scale


# the config that produced checkpoint_8.pth
# (deps/score_sde_pytorch/configs/vp/cifar10_ddpmpp_continuous.py:22-66)
CIFAR10_DDPMPP_CONTINUOUS = NCSNppConfig()

# VE CIFAR-10 NCSN++ (configs/ve/cifar10_ncsnpp_continuous.py): FIR + fourier
CIFAR10_NCSNPP_CONTINUOUS = NCSNppConfig(
    fir=True, resblock_type="biggan", embedding_type="fourier",
    scale_by_sigma=True, conditional=True)


def _plain_up(x, cfg):
    """Param-free x2 upsample (reference shared ``self.pyramid_upsample``)."""
    if cfg.fir:
        return firops.upsample_2d(x, k=list(cfg.fir_kernel))
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")


def _plain_down(x, cfg):
    """Param-free x2 downsample (reference shared ``self.pyramid_downsample``)."""
    if cfg.fir:
        return firops.downsample_2d(x, k=list(cfg.fir_kernel))
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class NCSNpp(nn.Module):
    config: NCSNppConfig
    sigmas: tuple = ()          # per-timestep sigma table (VE positional only)

    @nn.compact
    def __call__(self, x, time_cond, *, train: bool = False, mods=None):
        """``mods``: optional precomputed per-resblock temb projections from
        :func:`ncsnpp_schedule_biases` (one step's slice, ``{name: [1, C]}``);
        when given, the whole time-embedding chain and every resblock's
        ``Dense_0`` are skipped — under a static NI schedule they are loop
        constants (``time_cond`` is then only read for ``scale_by_sigma``)."""
        cfg = self.config
        act = nn.silu
        nf = cfg.nf
        num_resolutions = len(cfg.ch_mult)
        all_resolutions = [cfg.image_size // (2 ** i)
                           for i in range(num_resolutions)]

        counter = iter(range(10_000))

        def idx():
            return next(counter)

        ResnetBlock = functools.partial(
            L.ResnetBlockBigGANpp if cfg.resblock_type == "biggan"
            else L.ResnetBlockDDPMpp,
            dropout=cfg.dropout, init_scale=cfg.init_scale,
            skip_rescale=cfg.skip_rescale,
            **({"fir": cfg.fir, "fir_kernel": tuple(cfg.fir_kernel)}
               if cfg.resblock_type == "biggan" else {}))
        AttnBlock = functools.partial(
            L.AttnBlockpp, init_scale=cfg.init_scale,
            skip_rescale=cfg.skip_rescale)
        Up = functools.partial(L.Upsample, with_conv=cfg.resamp_with_conv,
                               fir=cfg.fir, fir_kernel=tuple(cfg.fir_kernel))
        Down = functools.partial(L.Downsample, with_conv=cfg.resamp_with_conv,
                                 fir=cfg.fir, fir_kernel=tuple(cfg.fir_kernel))

        def res(h, temb, **kw):
            name = f"m{idx()}"
            return ResnetBlock(name=name, **kw)(
                h, temb, tb=None if mods is None else mods[name],
                deterministic=not train)

        # --- time embedding --------------------------------------------------
        used_sigmas = None
        if cfg.embedding_type == "fourier":
            used_sigmas = time_cond
            if mods is None:
                temb = L.GaussianFourierProjection(
                    embedding_size=nf, scale=cfg.fourier_scale,
                    name=f"m{idx()}")(jnp.log(used_sigmas))
            else:
                idx()                    # keep the m{i} walk aligned
        else:
            if mods is None:
                temb = L.get_timestep_embedding(time_cond, nf)
            if self.sigmas:
                used_sigmas = jnp.asarray(np.asarray(self.sigmas),
                                          x.dtype)[time_cond.astype(jnp.int32)]

        if mods is not None:
            if not cfg.conditional:
                raise ValueError("mods= requires a conditional model")
            # every temb consumer carries a schedule-hoisted projection;
            # burn the embedder indices so the m{i} walk stays aligned
            idx(), idx()
            temb = None
        else:
            # keep the activation dtype the caller chose: the
            # sinusoidal/fourier embedding is f32, and without this cast the
            # per-block ``h + Dense(temb)`` promotes every activation
            # downstream to f32 (2x HBM traffic + f32 MXU convs on bf16)
            temb = temb.astype(x.dtype)

            if cfg.conditional:
                temb = nn.Dense(nf * 4, kernel_init=L.default_init(),
                                         name=f"m{idx()}")(temb)
                temb = nn.Dense(nf * 4, kernel_init=L.default_init(),
                                         name=f"m{idx()}")(act(temb))
            else:
                temb = None

        if not cfg.centered:
            x = 2 * x - 1.0

        # --- downsampling ----------------------------------------------------
        input_pyramid = x if cfg.progressive_input != "none" else None

        hs = [L.conv3x3(nf, name=f"m{idx()}")(x)]
        in_ch = nf
        for i_level in range(num_resolutions):
            for _ in range(cfg.num_res_blocks):
                out_ch = nf * cfg.ch_mult[i_level]
                h = res(hs[-1], temb, out_ch=out_ch)
                in_ch = out_ch
                if h.shape[1] in cfg.attn_resolutions:
                    h = AttnBlock(name=f"m{idx()}")(h)
                hs.append(h)

            if i_level != num_resolutions - 1:
                if cfg.resblock_type == "ddpm":
                    h = Down(name=f"m{idx()}")(hs[-1])
                else:
                    h = res(hs[-1], temb, down=True)

                if cfg.progressive_input == "input_skip":
                    # param-free FIR/avg downsample (the reference's shared
                    # self.pyramid_downsample module)
                    input_pyramid = _plain_down(input_pyramid, cfg)
                    h = L.Combine(dim2=in_ch, method=cfg.progressive_combine,
                                  name=f"m{idx()}")(input_pyramid, h)
                    if cfg.progressive_combine == "cat":
                        in_ch *= 2
                elif cfg.progressive_input == "residual":
                    input_pyramid = Down(out_ch=in_ch,
                                         name=f"m{idx()}")(input_pyramid)
                    if cfg.skip_rescale:
                        input_pyramid = (input_pyramid + h) / math.sqrt(2.0)
                    else:
                        input_pyramid = input_pyramid + h
                    h = input_pyramid
                hs.append(h)

        # --- bottleneck -------------------------------------------------------
        h = hs[-1]
        h = res(h, temb)
        h = AttnBlock(name=f"m{idx()}")(h)
        h = res(h, temb)

        # --- upsampling -------------------------------------------------------
        pyramid = None
        for i_level in reversed(range(num_resolutions)):
            for _ in range(cfg.num_res_blocks + 1):
                out_ch = nf * cfg.ch_mult[i_level]
                h = res(jnp.concatenate([h, hs.pop()], axis=-1), temb,
                        out_ch=out_ch)
                in_ch = out_ch

            if h.shape[1] in cfg.attn_resolutions:
                h = AttnBlock(name=f"m{idx()}")(h)

            if cfg.progressive != "none":
                if i_level == num_resolutions - 1:
                    gn = L.group_norm(in_ch, name=f"m{idx()}", dtype=h.dtype,
                                      act="silu")
                    if cfg.progressive == "output_skip":
                        pyramid = gn(h)
                        pyramid = L.conv3x3(cfg.num_channels,
                                            init_scale=cfg.init_scale,
                                            name=f"m{idx()}")(pyramid)
                    elif cfg.progressive == "residual":
                        pyramid = gn(h)
                        pyramid = L.conv3x3(in_ch, name=f"m{idx()}")(pyramid)
                else:
                    if cfg.progressive == "output_skip":
                        pyramid = _plain_up(pyramid, cfg)
                        ph = L.group_norm(in_ch, name=f"m{idx()}",
                                          dtype=h.dtype, act="silu")(h)
                        ph = L.conv3x3(cfg.num_channels, bias=True,
                                       init_scale=cfg.init_scale,
                                       name=f"m{idx()}")(ph)
                        pyramid = pyramid + ph
                    elif cfg.progressive == "residual":
                        pyramid = Up(out_ch=in_ch, name=f"m{idx()}")(pyramid)
                        if cfg.skip_rescale:
                            pyramid = (pyramid + h) / math.sqrt(2.0)
                        else:
                            pyramid = pyramid + h
                        h = pyramid

            if i_level != 0:
                if cfg.resblock_type == "ddpm":
                    h = Up(name=f"m{idx()}")(h)
                else:
                    h = res(h, temb, up=True)

        assert not hs

        if cfg.progressive == "output_skip":
            h = pyramid
        else:
            h = L.group_norm(in_ch, name=f"m{idx()}", dtype=h.dtype,
                             act="silu")(h)
            h = L.conv3x3(cfg.num_channels, init_scale=cfg.init_scale,
                          name=f"m{idx()}")(h)

        if cfg.scale_by_sigma:
            h = h / used_sigmas.reshape(-1, 1, 1, 1)
        return h


def ncsnpp_schedule_biases(model: NCSNpp, params, t_all, dtype=None):
    """Hoist NCSN++'s schedule-dependent conditioning out of the NI loop.

    The UNet analog of ``dit_schedule_mods``: under a static NI schedule the
    timestep is the SAME scalar for every batch element at every step, so
    the whole embedding chain (sinusoidal/fourier -> two Dense) and every
    resblock's ``Dense_0`` projection are loop constants — per (step, block)
    a single ``[C]`` bias vector.  Precomputing them removes ~35 MXU-starved
    kernels per forward; the bias broadcasts into the GN ``extra_bias`` fold
    exactly as before.  Applies the model's own parameters standalone — no
    duplicated math (matmul rows are batch-independent, so the hoisted rows
    equal the in-loop ones bitwise).

    ``t_all``: ``[S]`` schedule times (``sched.node[:n, 0]``).  Returns
    ``{resblock_name: [S, 1, C]}`` for the engine's ``step_inputs=`` hook;
    the per-step ``[1, C]`` slice broadcasts over the batch.
    """
    cfg = model.config
    if not cfg.conditional:
        raise ValueError("schedule-bias hoist requires a conditional model")
    act = nn.silu
    t_all = jnp.asarray(t_all, jnp.float32)
    if cfg.embedding_type == "fourier":
        w = jax.lax.stop_gradient(params["m0"]["W"])
        xp = jnp.log(t_all)[:, None] * w[None, :] * 2 * jnp.pi
        temb = jnp.concatenate([jnp.sin(xp), jnp.cos(xp)], axis=-1)
        d0 = 1
    else:
        temb = L.get_timestep_embedding(t_all, cfg.nf)
        d0 = 0
    if dtype is None:
        dtype = params[f"m{d0}"]["kernel"].dtype
    temb = temb.astype(dtype)                 # the forward's x.dtype cast
    temb = temb @ params[f"m{d0}"]["kernel"] + params[f"m{d0}"]["bias"]
    temb = (act(temb) @ params[f"m{d0 + 1}"]["kernel"]
            + params[f"m{d0 + 1}"]["bias"])
    sa = act(temb)
    return {
        name: (sa @ p["Dense_0"]["kernel"]
               + p["Dense_0"]["bias"])[:, None, :]
        for name, p in params.items()
        if isinstance(p, (dict, type(params))) and "Dense_0" in p
    }
