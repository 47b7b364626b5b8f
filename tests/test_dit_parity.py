"""DiT flax-vs-torch-reference forward parity.

Runs the REAL reference DiT (``deps/DiT/models.py``) on CPU with a minimal
timm stub (PatchEmbed/Attention/Mlp are canonical, field-name-compatible
re-implementations), converts random torch weights to the flax tree, and
asserts forward + CFG-forward parity.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _install_timm_stub():
    if "timm" in sys.modules:
        return
    import torch.nn as tnn

    class PatchEmbed(tnn.Module):
        def __init__(self, img_size, patch_size, in_chans, embed_dim,
                     bias=True):
            super().__init__()
            self.patch_size = (patch_size, patch_size)
            self.num_patches = (img_size // patch_size) ** 2
            self.proj = tnn.Conv2d(in_chans, embed_dim, patch_size,
                                   stride=patch_size, bias=bias)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    class Attention(tnn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads) ** -0.5
            self.qkv = tnn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = tnn.Linear(dim, dim)

        def forward(self, x):
            b, t, d = x.shape
            h = self.num_heads
            qkv = self.qkv(x).reshape(b, t, 3, h, d // h).permute(
                2, 0, 3, 1, 4)
            q, k, v = qkv.unbind(0)
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = attn.softmax(dim=-1)
            y = (attn @ v).transpose(1, 2).reshape(b, t, d)
            return self.proj(y)

    class Mlp(tnn.Module):
        def __init__(self, in_features, hidden_features, act_layer, drop=0):
            super().__init__()
            self.fc1 = tnn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = tnn.Linear(hidden_features, in_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    import importlib.machinery

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vit = types.ModuleType("timm.models.vision_transformer")
    vit.PatchEmbed, vit.Attention, vit.Mlp = PatchEmbed, Attention, Mlp
    models.vision_transformer = vit
    timm.models = models
    for mod in (timm, models, vit):
        # a None __spec__ breaks transformers' lazy availability probes
        # (importlib.util.find_spec) in later tests sharing the process
        mod.__spec__ = importlib.machinery.ModuleSpec(mod.__name__, None)
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.vision_transformer"] = vit


def _load_reference_dit():
    _install_timm_stub()
    path = "/root/reference/deps/DiT"
    # avoid the `models` name collision with score_sde's models/ package
    for k in [k for k in sys.modules
              if k == "models" or k.startswith("models.")]:
        if getattr(sys.modules[k], "__file__", "") and \
                path not in sys.modules[k].__file__:
            del sys.modules[k]
    while path in sys.path:
        sys.path.remove(path)
    sys.path.insert(0, path)
    import models as ref_dit_models
    return ref_dit_models


@pytest.fixture(scope="module")
def small_cfg():
    from naturaldiffusion_tpu.models.dit import DiTConfig
    return DiTConfig(input_size=8, patch_size=2, in_channels=4,
                     hidden_size=64, depth=2, num_heads=4,
                     class_dropout_prob=0.1, num_classes=10,
                     learn_sigma=True)


@pytest.fixture(scope="module")
def pair(small_cfg):
    import jax
    import jax.numpy as jnp
    from naturaldiffusion_tpu.models.dit import DiT, dit_torch_path_map
    from naturaldiffusion_tpu.models.convert import fill_from_torch

    ref_mod = _load_reference_dit()
    torch.manual_seed(0)
    ref = ref_mod.DiT(input_size=8, patch_size=2, in_channels=4,
                      hidden_size=64, depth=2, num_heads=4,
                      class_dropout_prob=0.1, num_classes=10,
                      learn_sigma=True).eval()
    # give the zero-initialized adaLN/final layers random values so parity
    # actually exercises them
    with torch.no_grad():
        for n, p in ref.named_parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn_like(p) * 0.02)

    model = DiT(config=small_cfg)
    x = np.random.default_rng(0).standard_normal((2, 4, 8, 8)).astype(
        np.float32)
    t = np.asarray([3.0, 700.0], np.float32)
    y = np.asarray([1, 7], np.int64)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.asarray(x.transpose(0, 2, 3, 1)),
                          jnp.asarray(t), jnp.asarray(y))
    params, unused = fill_from_torch(template["params"], ref.state_dict(),
                                     path_map=dit_torch_path_map)
    assert unused == ["pos_embed"], unused
    return ref, model, params, (x, t, y)


def test_dit_forward_parity(pair):
    import jax.numpy as jnp
    ref, model, params, (x, t, y) = pair
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t),
                   torch.from_numpy(y)).numpy()
    got = model.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.asarray(t), jnp.asarray(y))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.shape == (2, 8, 8, 8)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_dit_cfg_parity(pair):
    import jax.numpy as jnp
    from naturaldiffusion_tpu.models.dit import forward_with_cfg
    ref, model, params, (x, t, y) = pair
    with torch.no_grad():
        want = ref.forward_with_cfg(torch.from_numpy(x), torch.from_numpy(t),
                                    torch.from_numpy(y), 4.0).numpy()

    def apply_fn(xx, tt, yy):
        return model.apply({"params": params}, xx, tt, yy)

    got = forward_with_cfg(apply_fn, jnp.asarray(x.transpose(0, 2, 3, 1)),
                           jnp.asarray(t), jnp.asarray(y), 4.0, in_channels=4)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_dit_label_dropout_uses_null_token(small_cfg):
    """train=True must route dropped labels to embedding row num_classes."""
    import jax
    import jax.numpy as jnp
    from naturaldiffusion_tpu.models.dit import DiT
    import dataclasses
    cfg = dataclasses.replace(small_cfg, class_dropout_prob=1.0)
    model = DiT(config=cfg)
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.zeros((2,))
    y = jnp.asarray([0, 1])
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    out_drop = model.apply(params, x, t, y, train=True,
                           rngs={"label_dropout": jax.random.PRNGKey(1)})
    out_null = model.apply(params, x, t, jnp.asarray([10, 10]))
    np.testing.assert_allclose(np.asarray(out_drop), np.asarray(out_null),
                               atol=1e-6)


def test_dit_schedule_mods_forward_equals_standard():
    """dit_schedule_mods + the mods= fast path == the standard forward
    (same submodules applied standalone; only the matmul batching differs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from naturaldiffusion_tpu.models.dit import (DiT, DiTConfig,
                                                 dit_schedule_mods)

    cfg = DiTConfig(input_size=8, patch_size=2, in_channels=4,
                    hidden_size=64, depth=2, num_heads=4, num_classes=10)
    model = DiT(config=cfg)
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(ks[0], (4, 8, 8, 4), jnp.float32)
    y = jax.random.randint(ks[1], (4,), 0, 10)
    params = model.init(ks[2], x[:1], jnp.zeros(1),
                        jnp.zeros(1, jnp.int32))["params"]
    # adaLN-Zero inits the modulation Dense to zero; perturb so the mods
    # actually drive the blocks
    key = jax.random.PRNGKey(7)
    params = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(key, p.shape)
        if p.ndim >= 2 else p, params)

    t_all = jnp.asarray([999.0, 500.0, 1.0], jnp.float32)
    mods = dit_schedule_mods(model, params, t_all, y)
    for k in range(3):
        aux = jax.tree.map(lambda a: a[k], mods)
        t = jnp.full((4,), t_all[k], jnp.float32)
        want = model.apply({"params": params}, x, t, y)
        got = model.apply({"params": params}, x, t, y, mods=aux)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
