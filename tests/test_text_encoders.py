"""SD3 text encoders: Flax ports == random-init transformers torch twins.

VERDICT r1 item 9: CLIP-L/CLIP-G/T5 structural parity so `--embeds` is no
longer the only route — the day the SD3 safetensors appear, encode_prompt
runs natively through the same converters."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from naturaldiffusion_tpu.models.convert import fill_from_torch
from naturaldiffusion_tpu.models.text_encoders import (
    CLIPTextConfig, CLIPTextEncoder, clip_torch_path_map,
    T5Config, T5Encoder, t5_torch_path_map, sd3_encode_prompt,
    CLIP_L_SD3, CLIP_G_SD3, T5_XXL)

TINY_CLIP = CLIPTextConfig(vocab_size=100, hidden_size=64, num_layers=3,
                           num_heads=4, intermediate_size=128,
                           max_positions=16, projection_dim=48)
TINY_T5 = T5Config(vocab_size=100, d_model=64, d_kv=16, d_ff=128,
                   num_layers=3, num_heads=4)


def _hf_clip(cfg: CLIPTextConfig, eos: int):
    from transformers import CLIPTextConfig as HFC
    from transformers import CLIPTextModelWithProjection
    torch.manual_seed(0)
    hf = CLIPTextModelWithProjection(HFC(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_positions,
        projection_dim=cfg.projection_dim, hidden_act=cfg.hidden_act,
        eos_token_id=eos, bos_token_id=0)).eval()
    return hf


@pytest.mark.parametrize("act,eos", [("quick_gelu", 2), ("gelu", 99)])
def test_clip_parity(act, eos):
    cfg = dataclasses.replace(TINY_CLIP, hidden_act=act, eos_token_id=eos)
    hf = _hf_clip(cfg, eos)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 90, (2, 12))
    ids[:, -2] = eos if eos != 2 else 99     # eos==2: argmax finds max id
    tids = torch.from_numpy(ids)
    with torch.no_grad():
        out = hf(tids, output_hidden_states=True)
    want_pen = out.hidden_states[-2].numpy()
    want_pool = out.text_embeds.numpy()

    model = CLIPTextEncoder(config=cfg)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.asarray(ids))["params"]
    params, unused = fill_from_torch(template, hf.state_dict(),
                                     path_map=clip_torch_path_map)
    # position_ids buffers may linger in old transformers; nothing else
    assert all("position_ids" in k for k in unused), unused
    got_pen, got_pool = model.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got_pen), want_pen,
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_pool), want_pool,
                               atol=2e-5, rtol=2e-5)


def test_t5_parity():
    from transformers import T5Config as HFT5
    from transformers import T5EncoderModel
    torch.manual_seed(1)
    cfg = TINY_T5
    hf = T5EncoderModel(HFT5(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        d_ff=cfg.d_ff, num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu", dropout_rate=0.0)).eval()

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 100, (2, 20))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).last_hidden_state.numpy()

    model = T5Encoder(config=cfg)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    params, unused = fill_from_torch(template, hf.state_dict(),
                                     path_map=t5_torch_path_map)
    # 'encoder.embed_tokens.weight' is tied to 'shared.weight'
    assert all("embed_tokens" in k for k in unused), unused
    got = model.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=3e-5)


def test_encode_prompt_contract():
    """Shapes of the SD3 conditioning pair: [B, T_clip+T_t5, 4096] +
    [B, 2048-analog] (tiny dims here)."""
    cl = CLIPTextEncoder(config=TINY_CLIP)
    cg = CLIPTextEncoder(config=dataclasses.replace(
        TINY_CLIP, hidden_size=96, num_heads=6, projection_dim=80))
    # t5 d_model must equal the joint dim (as T5-XXL's 4096 does for SD3)
    t5 = T5Encoder(config=dataclasses.replace(TINY_T5, d_model=192,
                                              d_kv=48))
    ids = jnp.asarray(np.random.default_rng(0).integers(3, 90, (2, 12)))
    ids_t5 = jnp.asarray(np.random.default_rng(1).integers(0, 90, (2, 20)))
    pl = cl.init(jax.random.PRNGKey(0), ids)["params"]
    pg = cg.init(jax.random.PRNGKey(1), ids)["params"]
    pt = t5.init(jax.random.PRNGKey(2), ids_t5)["params"]

    prompt, pooled = sd3_encode_prompt(cl, pl, ids, cg, pg, ids,
                                       t5, pt, ids_t5, joint_dim=192)
    assert prompt.shape == (2, 12 + 20, 192)
    assert pooled.shape == (2, 48 + 80)
    # the clip span is zero-padded from 64+96=160 up to 192
    assert np.allclose(np.asarray(prompt[:, :12, 160:]), 0.0)
    assert not np.allclose(np.asarray(prompt[:, 12:, 160:]), 0.0)
    # no-T5 mode: diffusers appends a zero block of max_sequence_length
    prompt2, _ = sd3_encode_prompt(cl, pl, ids, cg, pg, ids, joint_dim=192)
    assert prompt2.shape == (2, 12 + 256, 192)
    assert np.allclose(np.asarray(prompt2[:, 12:]), 0.0)
    prompt3, _ = sd3_encode_prompt(cl, pl, ids, cg, pg, ids, joint_dim=192,
                                   max_sequence_length=0)
    assert prompt3.shape == (2, 12, 192)
    with pytest.raises(ValueError, match="exceeds"):
        sd3_encode_prompt(cl, pl, ids, cg, pg, ids, joint_dim=64)


def test_sd3_full_scale_configs():
    """The SD3-medium preset dims line up with MMDiT's conditioning dims."""
    from naturaldiffusion_tpu.models.mmdit import SD3_MEDIUM
    assert CLIP_L_SD3.projection_dim + CLIP_G_SD3.projection_dim \
        == SD3_MEDIUM.pooled_projection_dim
    assert T5_XXL.d_model == SD3_MEDIUM.joint_attention_dim
    assert CLIP_L_SD3.hidden_size + CLIP_G_SD3.hidden_size == 2048
