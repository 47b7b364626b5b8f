"""InceptionV3 (pytorch-fid variant) in Flax — the FID feature extractor.

Port of pytorch-fid's ``InceptionV3`` (used by the reference at
``src/CIFAR10NaturalInference.py:44-70``), including its deviations from
torchvision: avg-pool branches with ``count_include_pad=False``
(FIDInceptionA/C/E_1) and a MAX-pool pool-branch in the last block
(FIDInceptionE_2).  Weights convert from ``pt_inception-2015-12-05.pth``
with :func:`load_fid_inception_params`; module names mirror the torch keys.

Inference-only: BatchNorm is a frozen affine ((x - mean)/sqrt(var+eps) *
scale + bias).  Input: [N, H, W, 3] in [0, 1]; resized to 299 bilinear
(half-pixel = torch ``align_corners=False``) and scaled to [-1, 1]; output:
the 2048-d final-avg-pool features.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BN(nn.Module):
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class BasicConv2d(nn.Module):
    out_ch: int
    kernel: tuple
    stride: int = 1
    padding: tuple | str = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, self.kernel, (self.stride, self.stride),
                    padding=self.padding, use_bias=False, name="conv")(x)
        return nn.relu(BN(name="bn")(x))


def _pad(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


def avg_pool_nocount(x, window=3, stride=1, pad=1):
    """avg_pool with ``count_include_pad=False`` (the pytorch-fid quirk)."""
    ones = jnp.ones_like(x[..., :1])
    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    padding = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, padding)
    c = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, padding)
    return s / c


def max_pool(x, window=3, stride=2):
    return nn.max_pool(x, (window, window), (stride, stride))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_3")(b3)
        bp = avg_pool_nocount(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=_pad((0, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((3, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((3, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=_pad((0, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((3, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=_pad((0, 3)), name="branch7x7dbl_5")(bd)
        bp = avg_pool_nocount(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=_pad((0, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((3, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_kind: str = "avg"   # FIDInceptionE_1: avg(no count); E_2: MAX

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=_pad((0, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=_pad((1, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=_pad((0, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=_pad((1, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_kind == "avg":
            bp = avg_pool_nocount(x)
        else:   # FIDInceptionE_2: max pool (pytorch-fid deliberate deviation)
            bp = nn.max_pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    resize_input: bool = True
    normalize_input: bool = True
    with_logits: bool = False     # also return the 1008-way logits (for IS)

    @nn.compact
    def __call__(self, x):
        """x: [N, H, W, 3] in [0, 1] -> [N, 2048]."""
        if self.resize_input:
            n, h, w, c = x.shape
            x = jax.image.resize(x, (n, 299, 299, c), "bilinear")
        if self.normalize_input:
            x = 2.0 * x - 1.0

        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad(1), name="Conv2d_2b_3x3")(x)
        x = max_pool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        pool = x.mean(axis=(1, 2))   # global average pool -> [N, 2048]
        if self.with_logits:
            logits = nn.Dense(1008, name="fc")(pool)
            return pool, logits
        return pool


def convert_fid_inception_state(sd, template=None):
    """Convert a pytorch-fid/torchvision inception ``state_dict`` (flat
    name->tensor mapping, in memory) to the flax tree.  BN leaf mapping:
    scale<-weight, bias<-bias, mean<-running_mean, var<-running_var.
    The 1008-way ``fc`` head is kept when the template has one
    (``with_logits=True``, the IS path) and dropped otherwise."""
    from ..models.convert import fill_from_torch

    if template is None:
        model = FIDInceptionV3()
        template = model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 32, 32, 3)))["params"]
    keep_fc = "fc" in template
    sd = {k: v for k, v in sd.items()
          if not k.startswith("AuxLogits.")
          and (keep_fc or not k.startswith("fc."))
          and "num_batches_tracked" not in k}
    # rename BN stats to the flax leaves
    renamed = {}
    for k, v in sd.items():
        k = k.replace(".running_mean", ".mean").replace(".running_var", ".var")
        renamed[k] = v

    params, unused = fill_from_torch(template, renamed)
    return params, unused


def load_fid_inception_params(pth_path: str, template=None):
    """Convert pytorch-fid's ``pt_inception-2015-12-05.pth`` to the flax
    tree (see :func:`convert_fid_inception_state`)."""
    from ..models.convert import load_torch_checkpoint
    return convert_fid_inception_state(load_torch_checkpoint(pth_path),
                                       template=template)


def default_feature_fn(pth_path: str | None = None,
                       with_logits: bool = False):
    """Jitted [N,H,W,C]-in-[0,1] -> [N,2048] feature fn; random weights when
    no checkpoint is supplied (useful for smoke tests, NOT for real FID).

    ``with_logits=True`` appends the 1008-way IS logits, returning
    [N, 2048+1008] (pool ‖ logits) so one pass serves both FID and IS —
    the reference computes them from the same activations
    (``deps/score_sde_pytorch/run_lib.py:175-407``)."""
    model = FIDInceptionV3(with_logits=with_logits)
    if pth_path:
        template = None
        if with_logits:   # keep the fc head in the converted tree
            template = model.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 32, 32, 3)))["params"]
        params, _ = load_fid_inception_params(pth_path, template=template)
    else:
        # jitted init: eager init is one tunnel RPC per primitive on the
        # remote-TPU backend (~minutes for inception's ~300 modules)
        params = jax.jit(lambda k: model.init(
            k, jnp.zeros((1, 32, 32, 3)))["params"])(jax.random.PRNGKey(0))

    @jax.jit
    def fn(images):
        out = model.apply({"params": params}, jnp.asarray(images))
        if with_logits:
            pool, logits = out
            return jnp.concatenate([pool, logits], axis=-1)
        return out

    return fn
