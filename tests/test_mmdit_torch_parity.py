"""MMDiT numeric parity vs a random-init torch twin of diffusers'
SD3Transformer2DModel (closes the r1 'structural tests only' gap without
diffusers in the image).  The twin's state_dict uses the HF key layout, so
this also proves the converter path end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from naturaldiffusion_tpu.models.convert import fill_from_torch
from naturaldiffusion_tpu.models.mmdit import (MMDiT, MMDiTConfig,
                                               mmdit_torch_path_map)
from torch_mmdit_twin import TorchMMDiT

CFG = MMDiTConfig(sample_size=8, patch_size=2, in_channels=4,
                  hidden_size=64, depth=2, num_heads=4,
                  caption_projection_dim=64, joint_attention_dim=32,
                  pooled_projection_dim=48, pos_embed_max_size=8)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    twin = TorchMMDiT(sample_size=CFG.sample_size, patch=CFG.patch_size,
                      cin=CFG.in_channels, dim=CFG.hidden_size,
                      depth=CFG.depth, heads=CFG.num_heads,
                      ctx_dim=CFG.joint_attention_dim,
                      pooled_dim=CFG.pooled_projection_dim,
                      max_size=CFG.pos_embed_max_size).eval()
    # randomize the zero-initialized adaLN/proj_out layers too, so the
    # parity check exercises every path with non-trivial values
    with torch.no_grad():
        for name, p in twin.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)

    model = MMDiT(config=CFG)
    x = jnp.zeros((1, 8, 8, 4))
    template = model.init(jax.random.PRNGKey(0), x, jnp.zeros(1),
                          jnp.zeros((1, 6, 32)), jnp.zeros((1, 48)))["params"]
    params, unused = fill_from_torch(template, twin.state_dict(),
                                     path_map=mmdit_torch_path_map)
    assert unused == [], unused
    return twin, model, params


def test_mmdit_forward_parity(pair):
    twin, model, params = pair
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    t = np.asarray([100.0, 800.0], np.float32)
    ctx = rng.normal(size=(2, 6, 32)).astype(np.float32)
    pooled = rng.normal(size=(2, 48)).astype(np.float32)

    want = twin(torch.from_numpy(x).permute(0, 3, 1, 2),
                torch.from_numpy(t), torch.from_numpy(ctx),
                torch.from_numpy(pooled)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                 jnp.asarray(t), jnp.asarray(ctx),
                                 jnp.asarray(pooled)))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)


def test_mmdit_qk_norm_parity():
    """SD3.5 qk_norm=True: four separate RMSNorm scales must convert and
    match numerically (ADVICE r2 — one shared norm instance would leave
    norm_k/norm_added_q/norm_added_k at init and silently diverge)."""
    import dataclasses
    torch.manual_seed(2)
    cfg = dataclasses.replace(CFG, qk_norm=True)
    twin = TorchMMDiT(sample_size=cfg.sample_size, patch=cfg.patch_size,
                      cin=cfg.in_channels, dim=cfg.hidden_size,
                      depth=cfg.depth, heads=cfg.num_heads,
                      ctx_dim=cfg.joint_attention_dim,
                      pooled_dim=cfg.pooled_projection_dim,
                      max_size=cfg.pos_embed_max_size, qk_norm=True).eval()
    with torch.no_grad():
        for _, p in twin.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)
        # distinct scales per norm: a shared-instance bug would surface
        for blk in twin.transformer_blocks:
            for i, n in enumerate(["norm_q", "norm_k", "norm_added_q",
                                   "norm_added_k"]):
                getattr(blk.attn, n).weight.add_(0.1 * (i + 1))

    model = MMDiT(config=cfg)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                          jnp.zeros(1), jnp.zeros((1, 6, 32)),
                          jnp.zeros((1, 48)))["params"]
    params, unused = fill_from_torch(template, twin.state_dict(),
                                     path_map=mmdit_torch_path_map)
    assert unused == [], unused

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    t = np.asarray([100.0, 800.0], np.float32)
    ctx = rng.normal(size=(2, 6, 32)).astype(np.float32)
    pooled = rng.normal(size=(2, 48)).astype(np.float32)
    want = twin(torch.from_numpy(x).permute(0, 3, 1, 2),
                torch.from_numpy(t), torch.from_numpy(ctx),
                torch.from_numpy(pooled)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                 jnp.asarray(t), jnp.asarray(ctx),
                                 jnp.asarray(pooled)))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)


def test_mmdit_parity_uneven_crop(pair):
    """A smaller latent exercises the center-crop offset of the position
    table — the path where a fresh table would silently diverge."""
    twin, model, params = pair
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)   # gh=2 < max 8
    t = np.asarray([500.0], np.float32)
    ctx = rng.normal(size=(1, 6, 32)).astype(np.float32)
    pooled = rng.normal(size=(1, 48)).astype(np.float32)
    want = twin(torch.from_numpy(x).permute(0, 3, 1, 2),
                torch.from_numpy(t), torch.from_numpy(ctx),
                torch.from_numpy(pooled)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                 jnp.asarray(t), jnp.asarray(ctx),
                                 jnp.asarray(pooled)))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)


def test_fused_ln_pair_equals_separate(monkeypatch):
    """NATDIFF_MMDIT_FUSED_LN concatenates the streams for ONE LayerNorm
    statistics kernel — per-token math, so outputs must match the separate
    calls to float tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from naturaldiffusion_tpu.models.mmdit import MMDiT, MMDiTConfig

    cfg = MMDiTConfig(sample_size=8, patch_size=2, in_channels=4,
                      hidden_size=64, depth=2, num_heads=4,
                      caption_projection_dim=64, joint_attention_dim=32,
                      pooled_projection_dim=48, pos_embed_max_size=8)
    m = MMDiT(config=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    t = jnp.array([500.0, 3.0])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 32))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (2, 48))
    params = m.init(jax.random.PRNGKey(3), x, t, ctx, pooled)["params"]

    monkeypatch.setenv("NATDIFF_MMDIT_FUSED_LN", "0")
    want = m.apply({"params": params}, x, t, ctx, pooled)
    monkeypatch.setenv("NATDIFF_MMDIT_FUSED_LN", "1")
    got = m.apply({"params": params}, x, t, ctx, pooled)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-5)
