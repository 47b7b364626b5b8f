"""NCSNv2 flax-vs-torch-reference forward parity.

The vendored reference NCSNv2 cannot run as shipped (``layers.py:114``
crashes on bias=False convs; dilated blocks mix padding=1 with dilation=2/4
so residual shapes disagree).  The upstream ermongroup/ncsnv2 used
``padding=dilation``; we patch the reference's ``ncsn_conv3x3`` to that
intended form and compare against it.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_ncsnpp_parity import (_install_op_stub, _patch_interpolate,  # noqa: E402
                                REF)


def _build_reference(nf: int):
    _install_op_stub()
    _patch_interpolate()
    for k in [k for k in sys.modules
              if k == "models" or k.startswith("models.")]:
        if getattr(sys.modules[k], "__file__", "") and \
                REF not in sys.modules[k].__file__:
            del sys.modules[k]
    while REF in sys.path:
        sys.path.remove(REF)
    sys.path.insert(0, REF)

    import torch.nn as tnn
    from models import layers as ref_layers

    def ncsn_conv3x3(in_planes, out_planes, stride=1, bias=True, dilation=1,
                     init_scale=1.0, padding=1):
        # intended upstream semantics: padding tracks dilation; guard the
        # bias=False crash
        if dilation > 1:
            padding = dilation
        init_scale = 1e-10 if init_scale == 0 else init_scale
        conv = tnn.Conv2d(in_planes, out_planes, stride=stride, bias=bias,
                          dilation=dilation, padding=padding, kernel_size=3)
        conv.weight.data *= init_scale
        if conv.bias is not None:
            conv.bias.data *= init_scale
        return conv

    ref_layers.ncsn_conv3x3 = ncsn_conv3x3
    if "models.ncsnv2" in sys.modules:
        del sys.modules["models.ncsnv2"]
    import models.utils as mutils
    for name in ("ncsnv2_64", "ncsnv2_128", "ncsnv2_256", "ncsn"):
        mutils._MODELS.pop(name, None)
    from models import ncsnv2 as ref_ncsnv2
    ref_ncsnv2.conv3x3 = ncsn_conv3x3

    from types import SimpleNamespace as NS
    config = NS(model=NS(nf=nf, num_scales=16, sigma_min=0.01, sigma_max=50,
                         nonlinearity="elu", normalization="InstanceNorm++",
                         ngf=nf),
                data=NS(image_size=32, channels=3, num_channels=3,
                        centered=False))
    return ref_ncsnv2.NCSNv2(config).eval()


def test_ncsnv2_forward_parity():
    import jax
    import jax.numpy as jnp
    from naturaldiffusion_tpu.models.ncsnv2 import (NCSNv2, NCSNv2Config,
                                                    ncsnv2_torch_path_map)
    from naturaldiffusion_tpu.models.convert import fill_from_torch

    torch.manual_seed(0)
    ref = _build_reference(nf=16)

    rng = np.random.default_rng(0)
    x = rng.random((2, 3, 32, 32)).astype(np.float32)
    labels = np.asarray([0, 11], np.int64)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(labels)).numpy()

    cfg = NCSNv2Config(nf=16, num_scales=16)
    model = NCSNv2(config=cfg)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    template = model.init(jax.random.PRNGKey(0), x_nhwc,
                          jnp.asarray(labels))["params"]
    params, unused = fill_from_torch(template, ref.state_dict(),
                                     path_map=ncsnv2_torch_path_map)
    assert unused == ["sigmas"], unused
    got = model.apply({"params": params}, x_nhwc, jnp.asarray(labels))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def _build_reference_variant(cls_name: str, nf: int, image_size: int):
    # reuse the patched loader from _build_reference by importing it first
    _build_reference(nf=nf)
    import models.ncsnv2 as ref_ncsnv2
    from types import SimpleNamespace as NS
    config = NS(model=NS(nf=nf, num_scales=16, sigma_min=0.01, sigma_max=50,
                         nonlinearity="elu", normalization="InstanceNorm++",
                         ngf=nf),
                data=NS(image_size=image_size, channels=3, num_channels=3,
                        centered=False))
    return getattr(ref_ncsnv2, cls_name)(config).eval()


@pytest.mark.parametrize("cls_name,flax_name", [
    ("NCSNv2_128", "NCSNv2_128"),
    ("NCSNv2_256", "NCSNv2_256"),
])
def test_ncsnv2_large_variants_parity(cls_name, flax_name):
    import jax
    import jax.numpy as jnp
    from naturaldiffusion_tpu.models import ncsnv2 as nd_ncsnv2
    from naturaldiffusion_tpu.models.ncsnv2 import (NCSNv2Config,
                                                    ncsnv2_torch_path_map)
    from naturaldiffusion_tpu.models.convert import fill_from_torch

    torch.manual_seed(0)
    ref = _build_reference_variant(cls_name, nf=8, image_size=64)

    rng = np.random.default_rng(0)
    x = rng.random((1, 3, 64, 64)).astype(np.float32)
    labels = np.asarray([5], np.int64)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(labels)).numpy()

    model = getattr(nd_ncsnv2, flax_name)(
        config=NCSNv2Config(nf=8, num_scales=16, image_size=64))
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    template = model.init(jax.random.PRNGKey(0), x_nhwc,
                          jnp.asarray(labels))["params"]
    params, unused = fill_from_torch(template, ref.state_dict(),
                                     path_map=ncsnv2_torch_path_map)
    assert unused == ["sigmas"], unused
    got = np.asarray(model.apply({"params": params}, x_nhwc,
                                 jnp.asarray(labels))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_get_network_dispatch():
    from naturaldiffusion_tpu.models.ncsnv2 import (get_network, NCSNv2,
                                                    NCSNv2_128, NCSNv2_256)
    assert get_network(32) is NCSNv2
    assert get_network(128) is NCSNv2_128
    assert get_network(256) is NCSNv2_256


def test_ncsn_v1_conditional_parity():
    """NCSN v1 (class-conditional normalization) forward parity."""
    import jax
    import jax.numpy as jnp
    from naturaldiffusion_tpu.models.ncsnv2 import (NCSN, NCSNv2Config,
                                                    ncsnv2_torch_path_map)
    from naturaldiffusion_tpu.models.convert import fill_from_torch

    torch.manual_seed(0)
    _build_reference(nf=8)         # installs the patched conv + path
    # third latent reference bug: ConditionalResidualBlock defaults
    # dilation=None and then evaluates `dilation > 1` (layers.py:398,419)
    import models.layers as ref_layers
    if not getattr(ref_layers.ConditionalResidualBlock, "_nd_patch", False):
        orig = ref_layers.ConditionalResidualBlock.__init__

        def _init(self, *args, **kwargs):
            if kwargs.get("dilation") is None:
                kwargs["dilation"] = 1
            orig(self, *args, **kwargs)

        ref_layers.ConditionalResidualBlock.__init__ = _init
        ref_layers.ConditionalResidualBlock._nd_patch = True
    import models.ncsnv2 as ref_ncsnv2
    # fourth latent bug: NCSN builds its normalizer via
    # get_normalization(config) WITHOUT conditional=True (ncsnv2.py:166),
    # handing the unconditional class to conditional call sites
    ref_ncsnv2.get_normalization = lambda config, conditional=False: \
        ref_layers.ConditionalInstanceNorm2dPlus
    from types import SimpleNamespace as NS
    config = NS(model=NS(nf=8, num_scales=16, sigma_min=0.01, sigma_max=50,
                         nonlinearity="elu", normalization="InstanceNorm++",
                         ngf=8),
                data=NS(image_size=32, channels=3, num_channels=3,
                        centered=False))
    ref = ref_ncsnv2.NCSN(config).eval()

    rng = np.random.default_rng(0)
    x = rng.random((2, 3, 32, 32)).astype(np.float32)
    labels = np.asarray([2, 13], np.int64)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(labels)).numpy()

    model = NCSN(config=NCSNv2Config(nf=8, num_scales=16))
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    template = model.init(jax.random.PRNGKey(0), x_nhwc,
                          jnp.asarray(labels))["params"]
    params, unused = fill_from_torch(template, ref.state_dict(),
                                     path_map=ncsnv2_torch_path_map)
    assert unused == [], unused
    got = np.asarray(model.apply({"params": params}, x_nhwc,
                                 jnp.asarray(labels))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
