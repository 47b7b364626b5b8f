"""NCSN++ flax-vs-torch-reference forward parity.

Instantiates the REAL reference model (``deps/score_sde_pytorch/models/
ncsnpp.py``) on CPU with randomly initialized weights, converts the torch
state_dict to the flax tree, and requires the flax NHWC forward to match the
torch NCHW forward.  This is the strongest possible converter + architecture
test short of the (absent) pretrained checkpoint.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/deps/score_sde_pytorch"


def _install_op_stub():
    """The reference imports ``from op import upfirdn2d`` which JIT-compiles a
    CUDA extension; stub it with a torch-native implementation of the same
    semantics (zero-stuff -> pad -> flipped-kernel conv -> stride)."""
    if "op" in sys.modules:
        return

    def upfirdn2d_torch(x, kernel, up=1, down=1, pad=(0, 0)):
        import torch.nn.functional as F
        n, c, h, w = x.shape
        kh, kw = kernel.shape
        z = torch.zeros(n, c, h * up, w * up, dtype=x.dtype)
        z[:, :, ::up, ::up] = x          # trailing zeros already included
        p0, p1 = pad
        z = F.pad(z, (max(p0, 0), max(p1, 0), max(p0, 0), max(p1, 0)))
        if p0 < 0 or p1 < 0:
            z = z[:, :, max(-p0, 0):z.shape[2] - max(-p1, 0),
                  max(-p0, 0):z.shape[3] - max(-p1, 0)]
        wk = torch.flip(kernel, [0, 1]).reshape(1, 1, kh, kw).to(x.dtype)
        wk = wk.expand(c, 1, kh, kw)
        y = F.conv2d(z, wk, stride=down, groups=c)
        return y

    op_pkg = types.ModuleType("op")
    up_mod = types.ModuleType("op.upfirdn2d")
    up_mod.upfirdn2d = upfirdn2d_torch
    # `from op import upfirdn2d` must bind the FUNCTION (as the real
    # op/__init__.py re-exports it)
    op_pkg.upfirdn2d = upfirdn2d_torch
    sys.modules["op"] = op_pkg
    sys.modules["op.upfirdn2d"] = up_mod


def _ref_config(**model_overrides):
    from types import SimpleNamespace as NS
    model = dict(
        nf=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
        dropout=0.0, resamp_with_conv=True, conditional=True, fir=False,
        fir_kernel=[1, 3, 3, 1], skip_rescale=True, resblock_type="biggan",
        progressive="none", progressive_input="none",
        progressive_combine="sum", embedding_type="positional",
        fourier_scale=16, init_scale=0.0, nonlinearity="swish",
        scale_by_sigma=False, sigma_min=0.01, sigma_max=50, num_scales=1000,
        dropout_rate=0.0, beta_min=0.1, beta_max=20.0,
    )
    model.update(model_overrides)
    return NS(model=NS(**model),
              data=NS(image_size=16, num_channels=3, centered=True),
              training=NS(continuous=True))


def _patch_interpolate():
    """The reference calls ``F.interpolate(x, (2H, 2W), 'nearest')`` with the
    mode string in the scale_factor slot — accepted by old torch, rejected by
    modern torch.  Shim it so the reference runs unmodified."""
    import torch.nn.functional as F
    if getattr(F.interpolate, "_nd_shim", False):
        return
    orig = F.interpolate

    def interpolate(input, size=None, scale_factor=None, *args, **kwargs):
        if isinstance(scale_factor, str):
            return orig(input, size=size, mode=scale_factor, *args, **kwargs)
        return orig(input, size=size, scale_factor=scale_factor,
                    *args, **kwargs)

    interpolate._nd_shim = True
    F.interpolate = interpolate


def _build_reference(config):
    _install_op_stub()
    _patch_interpolate()
    # both reference trees define a top-level `models` module (DiT's models.py
    # vs score_sde's models/ package) — purge and re-prioritize
    for k in [k for k in sys.modules
              if k == "models" or k.startswith("models.")]:
        if getattr(sys.modules[k], "__file__", "") and \
                REF not in sys.modules[k].__file__:
            del sys.modules[k]
    while REF in sys.path:
        sys.path.remove(REF)
    sys.path.insert(0, REF)
    from models import ncsnpp as ref_ncsnpp   # noqa: F401  (registers model)
    return ref_ncsnpp.NCSNpp(config)


def _flax_config(ref_cfg):
    from naturaldiffusion_tpu.models.ncsnpp import NCSNppConfig
    m, d = ref_cfg.model, ref_cfg.data
    return NCSNppConfig(
        image_size=d.image_size, num_channels=d.num_channels, nf=m.nf,
        ch_mult=tuple(m.ch_mult), num_res_blocks=m.num_res_blocks,
        attn_resolutions=tuple(m.attn_resolutions), dropout=m.dropout,
        resamp_with_conv=m.resamp_with_conv, conditional=m.conditional,
        fir=m.fir, fir_kernel=tuple(m.fir_kernel),
        skip_rescale=m.skip_rescale, resblock_type=m.resblock_type,
        progressive=m.progressive, progressive_input=m.progressive_input,
        progressive_combine=m.progressive_combine,
        embedding_type=m.embedding_type, fourier_scale=m.fourier_scale,
        init_scale=m.init_scale, centered=d.centered,
        scale_by_sigma=m.scale_by_sigma)


def _parity(ref_cfg, time_vals, atol=1e-4):
    import jax
    import jax.numpy as jnp
    from naturaldiffusion_tpu.models.ncsnpp import NCSNpp
    from naturaldiffusion_tpu.models.convert import fill_from_torch

    torch.manual_seed(0)
    ref = _build_reference(ref_cfg).eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    t = np.asarray(time_vals, np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    model = NCSNpp(config=_flax_config(ref_cfg))
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    template = model.init(jax.random.PRNGKey(0), x_nhwc, jnp.asarray(t))
    params, unused = fill_from_torch(template["params"], ref.state_dict())
    assert unused == ["sigmas"], unused
    got = model.apply({"params": params}, x_nhwc, jnp.asarray(t))
    got = np.asarray(got).transpose(0, 3, 1, 2)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)


def test_parity_vp_biggan_positional():
    """The checkpoint_8.pth architecture family (VP DDPM++ continuous)."""
    _parity(_ref_config(), time_vals=[3.0, 700.0])


def test_parity_ve_fir_fourier():
    """VE NCSN++ family: FIR resampling + Fourier embedding + scale_by_sigma."""
    cfg = _ref_config(fir=True, embedding_type="fourier", scale_by_sigma=True)
    _parity(cfg, time_vals=[0.5, 21.3])


def test_parity_ddpm_resblock():
    """DDPM-style resblocks + explicit Up/Downsample modules."""
    cfg = _ref_config(resblock_type="ddpm")
    _parity(cfg, time_vals=[3.0, 700.0])


def test_parity_progressive():
    """output_skip/input_skip progressive paths (VE deep configs)."""
    cfg = _ref_config(fir=True, embedding_type="fourier",
                      progressive="output_skip",
                      progressive_input="input_skip",
                      progressive_combine="sum")
    _parity(cfg, time_vals=[0.5, 21.3])
