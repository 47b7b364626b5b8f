"""MMDiT + VAE structural tests and the SD3 NI app semantics."""

import jax
import jax.numpy as jnp
import numpy as np


def _small_mmdit():
    from naturaldiffusion_tpu.models.mmdit import MMDiT, MMDiTConfig
    cfg = MMDiTConfig(hidden_size=64, depth=2, num_heads=4,
                      joint_attention_dim=32, pooled_projection_dim=16,
                      in_channels=4)
    return MMDiT(config=cfg), cfg


def test_mmdit_shapes_and_context_flow():
    model, cfg = _small_mmdit()
    b = 2
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (b, 8, 8, 4)), jnp.float32)
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal(
        (b, 7, 32)), jnp.float32)
    pooled = jnp.zeros((b, 16))
    t = jnp.asarray([100.0, 900.0])
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, pooled)["params"]
    # adaLN-Zero: gates are zero at init, so perturb every zero kernel to
    # make information actually flow (as the DiT parity test does)
    key = jax.random.PRNGKey(42)
    params = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(key, p.shape)
        if p.ndim >= 2 and float(jnp.abs(p).sum()) == 0.0 else p, params)
    out = model.apply({"params": params}, x, t, ctx, pooled)
    assert out.shape == (b, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
    # context actually conditions the output
    out2 = model.apply({"params": params}, x, t, ctx + 1.0, pooled)
    assert np.abs(np.asarray(out2 - out)).max() > 1e-6
    # last block must NOT have context-stream output params
    last = params[f"transformer_blocks_{cfg.depth - 1}"]
    assert "attn_to_add_out" not in last
    assert "attn_to_add_out" in params["transformer_blocks_0"]


def test_mmdit_adaln_zero_init():
    """Zero-initialized modulation => identical blocks at init for any t."""
    model, _ = _small_mmdit()
    x = jnp.ones((1, 8, 8, 4))
    ctx = jnp.ones((1, 7, 32))
    pooled = jnp.ones((1, 16))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros(1), ctx,
                        pooled)["params"]
    o1 = model.apply({"params": params}, x, jnp.asarray([10.0]), ctx, pooled)
    o2 = model.apply({"params": params}, x, jnp.asarray([900.0]), ctx, pooled)
    # proj_out is zero-init -> output exactly 0 at init (adaLN-Zero property)
    np.testing.assert_allclose(np.asarray(o1), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o2), 0.0, atol=1e-6)


def test_mmdit_path_map():
    from naturaldiffusion_tpu.models.mmdit import mmdit_torch_path_map as pm
    assert pm(("transformer_blocks_3", "attn_to_q", "kernel")) == \
        "transformer_blocks.3.attn.to_q.kernel"
    assert pm(("transformer_blocks_0", "ff_net_0_proj", "bias")) == \
        "transformer_blocks.0.ff.net.0.proj.bias"
    assert pm(("time_text_embed", "timestep_embedder_linear_1", "kernel")) \
        == "time_text_embed.timestep_embedder.linear_1.kernel"
    assert pm(("pos_embed_proj", "kernel")) == "pos_embed.proj.kernel"


def test_vae_roundtrip_shapes():
    from naturaldiffusion_tpu.models.vae import AutoencoderKL, VAEConfig
    cfg = VAEConfig(base_channels=32, ch_mult=(1, 2), layers_per_block=1)
    vae = AutoencoderKL(config=cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 16, 16, 3)), jnp.float32)
    params = vae.init(jax.random.PRNGKey(0), x)["params"]
    mean, logvar = vae.apply({"params": params}, x,
                             method=AutoencoderKL.encode)
    assert mean.shape == (1, 8, 8, 4)             # one downsample (2 levels)
    out = vae.apply({"params": params}, mean, method=AutoencoderKL.decode)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_vae_path_map():
    from naturaldiffusion_tpu.models.vae import vae_torch_path_map as pm
    assert pm(("encoder", "down_blocks_0_resnets_1", "conv1", "kernel")) == \
        "encoder.down_blocks.0.resnets.1.conv1.kernel"
    assert pm(("decoder", "up_blocks_2_upsamplers_0_conv", "bias")) == \
        "decoder.up_blocks.2.upsamplers.0.conv.bias"
    assert pm(("encoder", "mid_block_attentions_0", "to_out_0", "kernel")) \
        == "encoder.mid_block.attentions.0.to_out.0.kernel"


def test_flow_match_sigmas():
    from naturaldiffusion_tpu.apps.sd3_ni import flow_match_sigmas
    ts, sig = flow_match_sigmas(28)
    assert len(ts) == 28 and len(sig) == 29
    assert sig[0] == 1.0 and sig[-1] == 0.0        # shift(1)=1
    assert np.all(np.diff(sig) < 0)
    # shift=3 midpoint check: sigma(0.5) = 3*.5/(1+2*.5) = 0.75
    ts2, sig2 = flow_match_sigmas(3)
    base = np.linspace(1000, 1.0, 3) / 1000
    want = 3 * base / (1 + 2 * base)
    np.testing.assert_allclose(sig2[:-1], want, rtol=1e-12)


def test_sd3_app_smoke(tmp_path):
    from naturaldiffusion_tpu.apps.sd3_ni import main
    rc = main(["--small", "--steps", "4", "--latent", "8",
               "--outdir", str(tmp_path)])
    assert rc == 0
    lat = np.load(tmp_path / "latents_random.npy")
    assert lat.shape == (1, 8, 8, 16) and np.isfinite(lat).all()


def test_sd3_weighted_sum_normalization():
    """Row-sum normalization now lives in the CoeffMatrix lift
    (reference ``weighted_sum``, ``src/SD3NaturalInference.py:157-168``)."""
    from naturaldiffusion_tpu.coeffs.sd3 import (sd3_weight_matrix,
                                                 flow_match_sigmas)
    w = np.array([[1.0, 0.0], [1.0, 3.0]])
    m = sd3_weight_matrix(w, 2)
    _, sigmas = flow_match_sigmas(2)
    # row k scaled by (1 - sigma_{k+1}); raw row [1, 3] normalizes to
    # [0.25, 0.75]
    np.testing.assert_allclose(m.x0[1], (1 - sigmas[2]) * np.r_[0.25, 0.75])
    np.testing.assert_allclose(m.eps[:, 0], sigmas[1:])
