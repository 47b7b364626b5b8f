"""NCSNv2 — the RefineNet-style score network (Flax, NHWC).

Rebuild of ``deps/score_sde_pytorch/models/ncsnv2.py:44-133`` and its layer
zoo (``models/layers.py``: ResidualBlock:453, CRPBlock:133, RCUBlock:183,
MSFBlock:234, RefineBlock:277; ``normalization.py``: InstanceNorm2dPlus:157).

NOTE — the vendored reference is broken as shipped: (a)
``ncsn_conv3x3`` calls ``conv.bias.data`` on bias=False convs
(``layers.py:114``) and (b) dilated residual blocks use padding=1 with
dilation=2/4 so the main path and shortcut disagree in shape
(``layers.py:462-507``).  The upstream ermongroup/ncsnv2 code these were
ported from uses ``padding=dilation``; we implement that intended
semantics, and the parity test patches the reference identically.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _conv3(out_ch, *, dilation: int = 1, bias: bool = True, stride: int = 1,
           name=None):
    pad = dilation          # intended ncsnv2 semantics (see module note)
    return nn.Conv(out_ch, (3, 3), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)),
                   kernel_dilation=(dilation, dilation), use_bias=bias,
                   name=name)


class InstanceNormPlus(nn.Module):
    """InstanceNorm2d++ (``normalization.py:157-183``): per-channel instance
    norm plus a normalized-channel-means modulation."""
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.normal(0.02), (c,))
        gamma = self.param("gamma", nn.initializers.normal(0.02), (c,))
        # (the torch init is normal(mean=1, std=0.02); converted weights
        # overwrite this, and tests perturb around 1 explicitly)
        means = x.mean(axis=(1, 2))                       # [B, C]
        m = means.mean(axis=-1, keepdims=True)
        v = means.var(axis=-1, keepdims=True, ddof=1)     # torch unbiased var
        means_n = (means - m) / jnp.sqrt(v + 1e-5)
        mu = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)           # biased, as torch IN
        h = (x - mu) / jnp.sqrt(var + 1e-5)
        h = h + means_n[:, None, None, :] * alpha
        out = gamma * h
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (c,))
            out = out + beta
        return out


class ConvMeanPool(nn.Module):
    """conv then 2x2 mean pool (``layers.py:351-369``)."""
    out_ch: int
    kernel: int = 3
    adjust_padding: bool = False

    @nn.compact
    def __call__(self, x):
        if self.adjust_padding:
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
        p = self.kernel // 2
        y = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                    padding=((p, p), (p, p)), name="conv")(x)
        return (y[:, ::2, ::2] + y[:, 1::2, ::2] + y[:, ::2, 1::2]
                + y[:, 1::2, 1::2]) / 4.0


class ResidualBlock(nn.Module):
    """(``layers.py:453-507``) with ELU and InstanceNorm++."""
    out_ch: int
    resample: str | None = None
    dilation: int = 1
    adjust_padding: bool = False

    @nn.compact
    def __call__(self, x):
        act = nn.elu
        in_ch = x.shape[-1]
        h = act(InstanceNormPlus(name="normalize1")(x))
        if self.resample == "down":
            if self.dilation > 1:
                h = _conv3(in_ch, dilation=self.dilation, name="conv1")(h)
                h = act(InstanceNormPlus(name="normalize2")(h))
                h = _conv3(self.out_ch, dilation=self.dilation,
                           name="conv2")(h)
                shortcut = _conv3(self.out_ch, dilation=self.dilation,
                                  name="shortcut")(x)
            else:
                h = _conv3(in_ch, name="conv1")(h)
                h = act(InstanceNormPlus(name="normalize2")(h))
                h = ConvMeanPool(self.out_ch,
                                 adjust_padding=self.adjust_padding,
                                 name="conv2")(h)
                shortcut = ConvMeanPool(self.out_ch, kernel=1,
                                        adjust_padding=self.adjust_padding,
                                        name="shortcut")(x)
        else:
            if self.dilation > 1:
                h = _conv3(self.out_ch, dilation=self.dilation,
                           name="conv1")(h)
                h = act(InstanceNormPlus(name="normalize2")(h))
                h = _conv3(self.out_ch, dilation=self.dilation,
                           name="conv2")(h)
                shortcut = x if in_ch == self.out_ch else _conv3(
                    self.out_ch, dilation=self.dilation, name="shortcut")(x)
            else:
                h = _conv3(self.out_ch, name="conv1")(h)
                h = act(InstanceNormPlus(name="normalize2")(h))
                h = _conv3(self.out_ch, name="conv2")(h)
                shortcut = x if in_ch == self.out_ch else nn.Conv(
                    self.out_ch, (1, 1), name="shortcut")(x)
        return shortcut + h


class CRPBlock(nn.Module):
    """chained residual pooling (``layers.py:133-154``).  NCSNv2 passes its
    ELU in (``ncsnv2.py:97-100``); ReLU is only the layer default."""
    n_stages: int = 2
    maxpool: bool = True
    act: str = "elu"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = getattr(nn, self.act)(x)
        path = x
        for i in range(self.n_stages):
            if self.maxpool:
                path = nn.max_pool(path, (5, 5), (1, 1),
                                   padding=((2, 2), (2, 2)))
            else:
                path = nn.avg_pool(path, (5, 5), (1, 1),
                                   padding=((2, 2), (2, 2)))
            path = _conv3(c, bias=False, name=f"convs_{i}")(path)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """residual conv units (``layers.py:183-204``)."""
    n_blocks: int
    n_stages: int = 2
    act: str = "elu"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = getattr(nn, self.act)(x)
                x = _conv3(c, bias=False, name=f"b{i + 1}_{j + 1}_conv")(x)
            x = x + residual
        return x


def _bilinear_align_corners(x, out_hw):
    """torch F.interpolate(mode='bilinear', align_corners=True) twin —
    jax.image.resize uses half-pixel centers, so do it explicitly."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x

    def axis_weights(n_in, n_out):
        pos = np.linspace(0.0, n_in - 1.0, n_out) if n_out > 1 \
            else np.zeros(1)
        lo = np.floor(pos).astype(np.int32)
        hi = np.minimum(lo + 1, n_in - 1)
        frac = (pos - lo).astype(np.float32)
        return lo, hi, frac

    ylo, yhi, yf = axis_weights(h, oh)
    xlo, xhi, xf = axis_weights(w, ow)
    yf = jnp.asarray(yf)[None, :, None, None]
    xf = jnp.asarray(xf)[None, None, :, None]
    top = x[:, ylo][:, :, xlo] * (1 - xf) + x[:, ylo][:, :, xhi] * xf
    bot = x[:, yhi][:, :, xlo] * (1 - xf) + x[:, yhi][:, :, xhi] * xf
    return top * (1 - yf) + bot * yf


class MSFBlock(nn.Module):
    """multi-scale fusion (``layers.py:234-250``)."""
    features: int

    @nn.compact
    def __call__(self, xs, shape):
        total = jnp.zeros((xs[0].shape[0],) + tuple(shape)
                          + (self.features,), xs[0].dtype)
        for i, xi in enumerate(xs):
            h = _conv3(self.features, name=f"convs_{i}")(xi)
            total = total + _bilinear_align_corners(h, shape)
        return total


class RefineBlock(nn.Module):
    """(``layers.py:277-310``)."""
    features: int
    n_inputs: int
    start: bool = False
    end: bool = False
    maxpool: bool = True

    act: str = "elu"

    @nn.compact
    def __call__(self, xs, output_shape):
        hs = [RCUBlock(2, 2, act=self.act, name=f"adapt_convs_{i}")(x)
              for i, x in enumerate(xs)]
        h = MSFBlock(self.features, name="msf")(hs, output_shape) \
            if self.n_inputs > 1 else hs[0]
        h = CRPBlock(2, maxpool=self.maxpool, act=self.act, name="crp")(h)
        return RCUBlock(3 if self.end else 1, 2, act=self.act,
                        name="output_convs")(h)


@dataclasses.dataclass(frozen=True)
class NCSNv2Config:
    image_size: int = 32
    num_channels: int = 3
    nf: int = 128
    centered: bool = False
    sigma_min: float = 0.01
    sigma_max: float = 50.0
    num_scales: int = 232          # ncsnv2 cifar10 convention


class NCSNv2(nn.Module):
    """the <96px variant (``ncsnv2.py:44-133``); scale-conditioned through
    the per-label sigma division only."""
    config: NCSNv2Config

    @nn.compact
    def __call__(self, x, labels):
        cfg = self.config
        act = nn.elu
        nf = cfg.nf
        adj = cfg.image_size == 28

        h = x if cfg.centered else 2 * x - 1.0
        out = nn.Conv(nf, (3, 3), padding=((1, 1), (1, 1)),
                      name="begin_conv")(h)

        l1 = ResidualBlock(nf, name="res1_0")(out)
        l1 = ResidualBlock(nf, name="res1_1")(l1)
        l2 = ResidualBlock(2 * nf, resample="down", name="res2_0")(l1)
        l2 = ResidualBlock(2 * nf, name="res2_1")(l2)
        l3 = ResidualBlock(2 * nf, resample="down", dilation=2,
                           name="res3_0")(l2)
        l3 = ResidualBlock(2 * nf, dilation=2, name="res3_1")(l3)
        l4 = ResidualBlock(2 * nf, resample="down", dilation=4,
                           adjust_padding=adj, name="res4_0")(l3)
        l4 = ResidualBlock(2 * nf, dilation=4, name="res4_1")(l4)

        r1 = RefineBlock(2 * nf, 1, start=True, name="refine1")(
            [l4], l4.shape[1:3])
        r2 = RefineBlock(2 * nf, 2, name="refine2")([l3, r1], l3.shape[1:3])
        r3 = RefineBlock(nf, 2, name="refine3")([l2, r2], l2.shape[1:3])
        out = RefineBlock(nf, 2, end=True, name="refine4")(
            [l1, r3], l1.shape[1:3])

        out = InstanceNormPlus(name="normalizer")(out)
        out = act(out)
        out = nn.Conv(cfg.num_channels, (3, 3), padding=((1, 1), (1, 1)),
                      name="end_conv")(out)

        sigmas = jnp.exp(jnp.linspace(np.log(cfg.sigma_max),
                                      np.log(cfg.sigma_min),
                                      cfg.num_scales))
        used = sigmas[labels.astype(jnp.int32)]
        return out / used.reshape(-1, 1, 1, 1)


def ncsnv2_torch_path_map(path: tuple[str, ...]) -> str:
    """res1_0 -> res1.0; adapt_convs_0 -> adapt_convs.0; bI_J_conv ->
    I_J_conv (same for _norm); convs_i/norms_i -> convs.i/norms.i;
    ConvMeanPool's inner 'conv' stays."""
    parts = []
    for seg in path:
        if seg.startswith("res") and "_" in seg:
            a, b = seg.split("_")
            parts.extend([a, b])
        elif seg.startswith("adapt_convs_"):
            parts.extend(["adapt_convs", seg.rsplit("_", 1)[1]])
        elif seg.startswith("convs_"):
            parts.extend(["convs", seg.rsplit("_", 1)[1]])
        elif seg.startswith("norms_"):
            parts.extend(["norms", seg.rsplit("_", 1)[1]])
        elif seg.startswith("b") and seg[1].isdigit() and \
                (seg.endswith("_conv") or seg.endswith("_norm")):
            parts.append(seg[1:])
        else:
            parts.append(seg)
    return ".".join(parts)


class NCSNv2_128(nn.Module):
    """the 96-128px variant (``ncsnv2.py:220-307``): five levels, channel
    mults (1, 2, 2, 4, 4), dilations kick in at level 4."""
    config: NCSNv2Config

    @nn.compact
    def __call__(self, x, labels):
        cfg = self.config
        act = nn.elu
        nf = cfg.nf

        h = x if cfg.centered else 2 * x - 1.0
        out = nn.Conv(nf, (3, 3), padding=((1, 1), (1, 1)),
                      name="begin_conv")(h)

        l1 = ResidualBlock(nf, name="res1_0")(out)
        l1 = ResidualBlock(nf, name="res1_1")(l1)
        l2 = ResidualBlock(2 * nf, resample="down", name="res2_0")(l1)
        l2 = ResidualBlock(2 * nf, name="res2_1")(l2)
        l3 = ResidualBlock(2 * nf, resample="down", name="res3_0")(l2)
        l3 = ResidualBlock(2 * nf, name="res3_1")(l3)
        l4 = ResidualBlock(4 * nf, resample="down", dilation=2,
                           name="res4_0")(l3)
        l4 = ResidualBlock(4 * nf, dilation=2, name="res4_1")(l4)
        l5 = ResidualBlock(4 * nf, resample="down", dilation=4,
                           name="res5_0")(l4)
        l5 = ResidualBlock(4 * nf, dilation=4, name="res5_1")(l5)

        r1 = RefineBlock(4 * nf, 1, start=True, name="refine1")(
            [l5], l5.shape[1:3])
        r2 = RefineBlock(2 * nf, 2, name="refine2")([l4, r1], l4.shape[1:3])
        r3 = RefineBlock(2 * nf, 2, name="refine3")([l3, r2], l3.shape[1:3])
        r4 = RefineBlock(nf, 2, name="refine4")([l2, r3], l2.shape[1:3])
        out = RefineBlock(nf, 2, end=True, name="refine5")(
            [l1, r4], l1.shape[1:3])

        out = InstanceNormPlus(name="normalizer")(out)
        out = nn.Conv(cfg.num_channels, (3, 3), padding=((1, 1), (1, 1)),
                      name="end_conv")(act(out))
        sigmas = jnp.exp(jnp.linspace(np.log(cfg.sigma_max),
                                      np.log(cfg.sigma_min),
                                      cfg.num_scales))
        used = sigmas[labels.astype(jnp.int32)]
        return out / used.reshape(-1, 1, 1, 1)


class NCSNv2_256(nn.Module):
    """the 128-256px variant (``ncsnv2.py:310-411``): six levels (res31
    inserted) and the matching refine31 fusion order."""
    config: NCSNv2Config

    @nn.compact
    def __call__(self, x, labels):
        cfg = self.config
        act = nn.elu
        nf = cfg.nf

        h = x if cfg.centered else 2 * x - 1.0
        out = nn.Conv(nf, (3, 3), padding=((1, 1), (1, 1)),
                      name="begin_conv")(h)

        l1 = ResidualBlock(nf, name="res1_0")(out)
        l1 = ResidualBlock(nf, name="res1_1")(l1)
        l2 = ResidualBlock(2 * nf, resample="down", name="res2_0")(l1)
        l2 = ResidualBlock(2 * nf, name="res2_1")(l2)
        l3 = ResidualBlock(2 * nf, resample="down", name="res3_0")(l2)
        l3 = ResidualBlock(2 * nf, name="res3_1")(l3)
        l31 = ResidualBlock(2 * nf, resample="down", name="res31_0")(l3)
        l31 = ResidualBlock(2 * nf, name="res31_1")(l31)
        l4 = ResidualBlock(4 * nf, resample="down", dilation=2,
                           name="res4_0")(l31)
        l4 = ResidualBlock(4 * nf, dilation=2, name="res4_1")(l4)
        l5 = ResidualBlock(4 * nf, resample="down", dilation=4,
                           name="res5_0")(l4)
        l5 = ResidualBlock(4 * nf, dilation=4, name="res5_1")(l5)

        r1 = RefineBlock(4 * nf, 1, start=True, name="refine1")(
            [l5], l5.shape[1:3])
        r2 = RefineBlock(2 * nf, 2, name="refine2")([l4, r1], l4.shape[1:3])
        r31 = RefineBlock(2 * nf, 2, name="refine31")([l31, r2],
                                                      l31.shape[1:3])
        r3 = RefineBlock(2 * nf, 2, name="refine3")([l3, r31], l3.shape[1:3])
        r4 = RefineBlock(nf, 2, name="refine4")([l2, r3], l2.shape[1:3])
        out = RefineBlock(nf, 2, end=True, name="refine5")(
            [l1, r4], l1.shape[1:3])

        out = InstanceNormPlus(name="normalizer")(out)
        out = nn.Conv(cfg.num_channels, (3, 3), padding=((1, 1), (1, 1)),
                      name="end_conv")(act(out))
        sigmas = jnp.exp(jnp.linspace(np.log(cfg.sigma_max),
                                      np.log(cfg.sigma_min),
                                      cfg.num_scales))
        used = sigmas[labels.astype(jnp.int32)]
        return out / used.reshape(-1, 1, 1, 1)


def get_network(image_size: int):
    """Size dispatch (reference ``ncsnv2.py:31-40``)."""
    if image_size < 96:
        return NCSNv2
    if image_size <= 128:
        return NCSNv2_128
    if image_size <= 256:
        return NCSNv2_256
    raise NotImplementedError(image_size)


# -- conditional (NCSN v1) variants -------------------------------------------


class CondInstanceNormPlus(nn.Module):
    """Class-conditional InstanceNorm++ (``normalization.py:186-215``):
    gamma/alpha(/beta) come from a per-class embedding table."""
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        n_out = (3 if self.bias else 2) * c
        embed = nn.Embed(self.num_classes, n_out,
                         embedding_init=nn.initializers.normal(0.02),
                         name="embed")(y.astype(jnp.int32))
        means = x.mean(axis=(1, 2))
        m = means.mean(axis=-1, keepdims=True)
        v = means.var(axis=-1, keepdims=True, ddof=1)
        means_n = (means - m) / jnp.sqrt(v + 1e-5)
        mu = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        h = (x - mu) / jnp.sqrt(var + 1e-5)
        if self.bias:
            gamma, alpha, beta = jnp.split(embed, 3, axis=-1)
        else:
            gamma, alpha = jnp.split(embed, 2, axis=-1)
            beta = None
        h = h + means_n[:, None, None, :] * alpha[:, None, None, :]
        out = gamma[:, None, None, :] * h
        if beta is not None:
            out = out + beta[:, None, None, :]
        return out


class CondResidualBlock(nn.Module):
    """(``layers.py:397-450``).  The reference's resample=None channel-change
    shortcut is a latent bug (bare nn.Conv2d partial without kernel size,
    'Something wierd here'); we use the 1x1 conv the unconditional block
    uses — that path is never exercised by NCSN's configs."""
    out_ch: int
    num_classes: int
    resample: str | None = None
    dilation: int = 1
    adjust_padding: bool = False

    @nn.compact
    def __call__(self, x, y):
        act = nn.elu
        in_ch = x.shape[-1]
        norm = lambda name: CondInstanceNormPlus(self.num_classes, name=name)
        h = act(norm("normalize1")(x, y))
        if self.resample == "down":
            if self.dilation > 1:
                h = _conv3(in_ch, dilation=self.dilation, name="conv1")(h)
                h = act(norm("normalize2")(h, y))
                h = _conv3(self.out_ch, dilation=self.dilation,
                           name="conv2")(h)
                shortcut = _conv3(self.out_ch, dilation=self.dilation,
                                  name="shortcut")(x)
            else:
                h = _conv3(in_ch, name="conv1")(h)
                h = act(norm("normalize2")(h, y))
                h = ConvMeanPool(self.out_ch,
                                 adjust_padding=self.adjust_padding,
                                 name="conv2")(h)
                shortcut = ConvMeanPool(self.out_ch, kernel=1,
                                        adjust_padding=self.adjust_padding,
                                        name="shortcut")(x)
        else:
            if self.dilation > 1:
                h = _conv3(self.out_ch, dilation=self.dilation,
                           name="conv1")(h)
                h = act(norm("normalize2")(h, y))
                h = _conv3(self.out_ch, dilation=self.dilation,
                           name="conv2")(h)
                shortcut = x if in_ch == self.out_ch else _conv3(
                    self.out_ch, dilation=self.dilation, name="shortcut")(x)
            else:
                h = _conv3(self.out_ch, name="conv1")(h)
                h = act(norm("normalize2")(h, y))
                h = _conv3(self.out_ch, name="conv2")(h)
                shortcut = x if in_ch == self.out_ch else nn.Conv(
                    self.out_ch, (1, 1), name="shortcut")(x)
        return shortcut + h


class CondCRPBlock(nn.Module):
    """(``layers.py:157-180``) — note: AVG pool (the unconditional CRP uses
    max), norm before pool."""
    num_classes: int
    n_stages: int = 2
    act: str = "elu"

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        x = getattr(nn, self.act)(x)
        path = x
        for i in range(self.n_stages):
            path = CondInstanceNormPlus(self.num_classes,
                                        name=f"norms_{i}")(path, y)
            path = nn.avg_pool(path, (5, 5), (1, 1),
                               padding=((2, 2), (2, 2)))
            path = _conv3(c, bias=False, name=f"convs_{i}")(path)
            x = path + x
        return x


class CondRCUBlock(nn.Module):
    """(``layers.py:207-231``) — norm BEFORE act+conv each stage."""
    n_blocks: int
    num_classes: int
    n_stages: int = 2
    act: str = "elu"

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = CondInstanceNormPlus(
                    self.num_classes, name=f"b{i + 1}_{j + 1}_norm")(x, y)
                x = getattr(nn, self.act)(x)
                x = _conv3(c, bias=False, name=f"b{i + 1}_{j + 1}_conv")(x)
            x = x + residual
        return x


class CondMSFBlock(nn.Module):
    """(``layers.py:253-274``)."""
    features: int
    num_classes: int

    @nn.compact
    def __call__(self, xs, y, shape):
        total = jnp.zeros((xs[0].shape[0],) + tuple(shape)
                          + (self.features,), xs[0].dtype)
        for i, xi in enumerate(xs):
            h = CondInstanceNormPlus(self.num_classes,
                                     name=f"norms_{i}")(xi, y)
            h = _conv3(self.features, name=f"convs_{i}")(h)
            total = total + _bilinear_align_corners(h, shape)
        return total


class CondRefineBlock(nn.Module):
    """(``layers.py:313-345``)."""
    features: int
    n_inputs: int
    num_classes: int
    start: bool = False
    end: bool = False
    act: str = "elu"

    @nn.compact
    def __call__(self, xs, y, output_shape):
        hs = [CondRCUBlock(2, self.num_classes, 2, act=self.act,
                           name=f"adapt_convs_{i}")(x, y)
              for i, x in enumerate(xs)]
        h = CondMSFBlock(self.features, self.num_classes,
                         name="msf")(hs, y, output_shape) \
            if self.n_inputs > 1 else hs[0]
        h = CondCRPBlock(self.num_classes, 2, act=self.act,
                         name="crp")(h, y)
        return CondRCUBlock(3 if self.end else 1, self.num_classes, 2,
                            act=self.act, name="output_convs")(h, y)


class NCSN(nn.Module):
    """NCSN v1 (``ncsnv2.py:160-216``): the class-conditional RefineNet;
    output is NOT divided by sigma (the v1 loss carries the scaling)."""
    config: NCSNv2Config

    @nn.compact
    def __call__(self, x, labels):
        cfg = self.config
        act = nn.elu
        nf = cfg.nf
        nc = cfg.num_scales
        adj = cfg.image_size == 28

        h = x if cfg.centered else 2 * x - 1.0
        out = nn.Conv(nf, (3, 3), padding=((1, 1), (1, 1)),
                      name="begin_conv")(h)

        l1 = CondResidualBlock(nf, nc, name="res1_0")(out, labels)
        l1 = CondResidualBlock(nf, nc, name="res1_1")(l1, labels)
        l2 = CondResidualBlock(2 * nf, nc, resample="down",
                               name="res2_0")(l1, labels)
        l2 = CondResidualBlock(2 * nf, nc, name="res2_1")(l2, labels)
        l3 = CondResidualBlock(2 * nf, nc, resample="down", dilation=2,
                               name="res3_0")(l2, labels)
        l3 = CondResidualBlock(2 * nf, nc, dilation=2,
                               name="res3_1")(l3, labels)
        l4 = CondResidualBlock(2 * nf, nc, resample="down", dilation=4,
                               adjust_padding=adj, name="res4_0")(l3, labels)
        l4 = CondResidualBlock(2 * nf, nc, dilation=4,
                               name="res4_1")(l4, labels)

        r1 = CondRefineBlock(2 * nf, 1, nc, start=True, name="refine1")(
            [l4], labels, l4.shape[1:3])
        r2 = CondRefineBlock(2 * nf, 2, nc, name="refine2")(
            [l3, r1], labels, l3.shape[1:3])
        r3 = CondRefineBlock(nf, 2, nc, name="refine3")(
            [l2, r2], labels, l2.shape[1:3])
        out = CondRefineBlock(nf, 2, nc, end=True, name="refine4")(
            [l1, r3], labels, l1.shape[1:3])

        out = CondInstanceNormPlus(nc, name="normalizer")(out, labels)
        out = act(out)
        return nn.Conv(cfg.num_channels, (3, 3), padding=((1, 1), (1, 1)),
                       name="end_conv")(out)
