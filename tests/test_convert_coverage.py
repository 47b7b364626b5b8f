"""Checkpoint-layout coverage on synthetic .pth files (VERDICT r1 item 10).

The three real blobs (score-SDE ``checkpoint_8.pth``, ``DiT-XL-2-256x256.pt``,
SD3 safetensors) are absent from the snapshot; these tests freeze their
exact on-disk layouts with tiny synthetic state so the day the blobs appear
``load_torch_checkpoint`` + the path maps work with zero new code.

Layouts covered:
* score-SDE training state ``{model(+DataParallel 'module.'), ema
  {shadow_params in parameters() order}, optimizer, step}``
  (``deps/score_sde_pytorch/utils.py:7-28``, ``models/ema.py:10-97``);
* DiT release format ``{model, ema}`` of plain state_dicts;
* bare state_dict (HF diffusers torch save).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from naturaldiffusion_tpu.models.convert import (load_torch_checkpoint,
                                                 fill_from_torch)


class _TinyNet(torch.nn.Module):
    """Conv + BN (buffers!) + linear — enough structure to catch ordering
    bugs between parameters() and state_dict()."""

    def __init__(self):
        super().__init__()
        self.register_buffer("sigmas", torch.linspace(1.0, 0.01, 5))
        self.conv = torch.nn.Conv2d(3, 4, 3, padding=1)
        self.bn = torch.nn.BatchNorm2d(4)
        self.fc = torch.nn.Linear(4, 2)


def _score_sde_checkpoint(tmp_path, decay_mark=0.123):
    torch.manual_seed(0)
    net = _TinyNet()
    # EMA shadows = params + decay_mark so we can tell them apart
    shadows = [p.detach().clone() + decay_mark for p in net.parameters()]
    sd = {"module." + k: v for k, v in net.state_dict().items()}
    ckpt = {
        "model": sd,
        "ema": {"decay": 0.9999, "num_updates": 7, "shadow_params": shadows},
        "optimizer": {"state": {}, "param_groups": []},
        "step": 80000,
    }
    p = tmp_path / "checkpoint_8.pth"
    torch.save(ckpt, p)
    return net, p


def test_score_sde_layout_prefers_ema(tmp_path):
    net, p = _score_sde_checkpoint(tmp_path)
    flat = load_torch_checkpoint(str(p))
    # params come from the EMA shadows...
    np.testing.assert_allclose(
        flat["conv.weight"],
        net.conv.weight.detach().numpy() + 0.123, atol=1e-6)
    np.testing.assert_allclose(
        flat["fc.bias"], net.fc.bias.detach().numpy() + 0.123, atol=1e-6)
    # ...buffers from the model (EMA tracks parameters() only)
    np.testing.assert_allclose(flat["sigmas"],
                               net.sigmas.numpy(), atol=1e-7)
    np.testing.assert_allclose(flat["bn.running_mean"],
                               net.bn.running_mean.numpy(), atol=1e-7)
    # DataParallel 'module.' prefixes stripped
    assert not any(k.startswith("module.") for k in flat)


def test_score_sde_layout_shape_misalignment_raises(tmp_path):
    net, p = _score_sde_checkpoint(tmp_path)
    ckpt = torch.load(p, weights_only=False)
    del ckpt["ema"]["shadow_params"][0]     # drop one shadow -> misaligned
    torch.save(ckpt, p)
    with pytest.raises(ValueError, match="misalignment"):
        load_torch_checkpoint(str(p))


def test_dit_release_layout(tmp_path):
    """DiT-XL-2-256x256.pt ships {'model': sd, 'ema': sd} — the loader must
    pick the EMA state_dict."""
    torch.manual_seed(1)
    net = _TinyNet()
    ema = {k: v + 1.0 for k, v in net.state_dict().items()}
    torch.save({"model": net.state_dict(), "ema": ema},
               tmp_path / "dit.pt")
    flat = load_torch_checkpoint(str(tmp_path / "dit.pt"))
    np.testing.assert_allclose(flat["conv.weight"],
                               net.conv.weight.detach().numpy() + 1.0,
                               atol=1e-6)


def test_bare_state_dict_layout(tmp_path):
    torch.manual_seed(2)
    net = _TinyNet()
    torch.save(net.state_dict(), tmp_path / "bare.pth")
    flat = load_torch_checkpoint(str(tmp_path / "bare.pth"))
    np.testing.assert_allclose(flat["fc.weight"],
                               net.fc.weight.detach().numpy(), atol=1e-7)


def test_mmdit_conversion_covers_full_tree():
    """Synthetic HF-layout MMDiT state dict -> every flax leaf filled, no
    missing keys: the converter map is total over the model tree."""
    import jax
    import jax.numpy as jnp
    from naturaldiffusion_tpu.models.mmdit import (MMDiT, MMDiTConfig,
                                                   mmdit_torch_path_map)
    from naturaldiffusion_tpu.models.convert import _torch_leaf_and_transform

    cfg = MMDiTConfig(sample_size=8, patch_size=2, in_channels=4,
                      hidden_size=64, depth=2, num_heads=4,
                      caption_projection_dim=64, joint_attention_dim=32,
                      pooled_projection_dim=48, pos_embed_max_size=8)
    model = MMDiT(config=cfg)
    x = jnp.zeros((1, 8, 8, 4))
    template = model.init(jax.random.PRNGKey(0), x, jnp.zeros(1),
                          jnp.zeros((1, 6, 32)), jnp.zeros((1, 48)))["params"]

    # build the torch-layout dict FROM the template (inverse transform)
    flat = jax.tree_util.tree_flatten_with_path(template)[0]
    sd = {}
    rng = np.random.default_rng(0)
    for kp, leaf in flat:
        path = tuple(getattr(k, "key", str(k)) for k in kp)
        tleaf, _tf = _torch_leaf_and_transform(path)
        key = mmdit_torch_path_map(path[:-1]) + "." + tleaf
        arr = rng.normal(size=np.asarray(leaf).shape).astype(np.float32)
        if arr.ndim == 2:
            arr = arr.T
        elif arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        sd[key] = torch.from_numpy(np.ascontiguousarray(arr))

    params, unused = fill_from_torch(template, sd,
                                     path_map=mmdit_torch_path_map)
    assert unused == []
    # spot check one transpose round-trips
    got = params["transformer_blocks_0"]["attn_to_q"]["kernel"]
    want = sd["transformer_blocks.0.attn.to_q.weight"].numpy().T
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-7)
