"""SD3's text-conditioning stack in Flax: CLIP-L, CLIP-G, T5-XXL encoder.

The reference drives MMDiT through ``pipe.encode_prompt`` — three text
encoders (``src/SD3NaturalInference.py:175-184``).  These are TPU-native
ports of the HF architectures the SD3 checkpoint ships
(``text_encoder`` = CLIP-L/14, ``text_encoder_2`` = OpenCLIP bigG,
``text_encoder_3`` = T5-v1.1-XXL encoder), with path maps so the
safetensors convert through the same name-and-transpose machinery as every
other backbone (:mod:`.convert`).  Structural parity vs random-init
``transformers`` torch twins is pinned in ``tests/test_text_encoders.py``.

Faithfulness notes (each is an upstream quirk that changes numerics):

* CLIP pooling: for checkpoints with ``eos_token_id == 2`` HF takes the
  position of the *highest token id* (``input_ids.argmax(-1)``, the legacy
  path both SD3 CLIP configs hit); otherwise the first EOS position.
* diffusers reads the **penultimate** hidden state (``hidden_states[-2]``,
  i.e. the input of the last layer) for the sequence embeddings — NOT the
  final-layer-norm output — while the pooled vector comes from the final
  output.  ``CLIPTextEncoder`` returns both.
* T5 attention has NO 1/sqrt(d) scaling; the relative position bias is
  computed once in block 0 and shared; the v1.1 FFN is gated
  (``wo(gelu_new(wi_0 x) * wi_1 x)``) with tanh-approximated GELU.
* diffusers calls T5 without an attention mask (padding attends); matched.

Tokenization to input ids stays external (CLIP BPE / T5 sentencepiece need
their vocab assets); the encoders consume ``[B, T]`` int32 ids.
"""

from __future__ import annotations

import dataclasses
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 77
    hidden_act: str = "quick_gelu"      # CLIP-L; bigG uses "gelu"
    projection_dim: int = 768
    eos_token_id: int = 2
    layer_norm_eps: float = 1e-5


# SD3-medium text_encoder / text_encoder_2
CLIP_L_SD3 = CLIPTextConfig()
CLIP_G_SD3 = CLIPTextConfig(hidden_size=1280, num_layers=32, num_heads=20,
                            intermediate_size=5120, hidden_act="gelu",
                            projection_dim=1280)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(name)


class _CLIPLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, causal_bias):
        c = self.cfg
        d, h = c.hidden_size, c.num_heads
        hd = d // h
        ln = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm1")(x)
        b, t, _ = ln.shape

        def heads(v):
            return v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(d, name="self_attn_q_proj")(ln)) * (hd ** -0.5)
        k = heads(nn.Dense(d, name="self_attn_k_proj")(ln))
        v = heads(nn.Dense(d, name="self_attn_v_proj")(ln))
        attn = jnp.einsum("bhqc,bhkc->bhqk", q, k) + causal_bias
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + nn.Dense(d, name="self_attn_out_proj")(o)

        ln2 = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm2")(x)
        y = nn.Dense(c.intermediate_size, name="mlp_fc1")(ln2)
        y = nn.Dense(d, name="mlp_fc2")(_act(c.hidden_act)(y))
        return x + y


class CLIPTextEncoder(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids):
        """ids [B, T] -> (penultimate_hidden [B, T, D], pooled_proj [B, P]).

        ``penultimate_hidden`` is ``hidden_states[-2]`` (what diffusers SD3
        feeds the MMDiT context); ``pooled_proj`` is the projected EOS
        pooling from the final output."""
        c = self.config
        b, t = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size,
                       name="token_embedding")(input_ids)
        pos = nn.Embed(c.max_positions, c.hidden_size,
                       name="position_embedding")(jnp.arange(t))
        x = tok + pos[None]

        causal = jnp.triu(jnp.full((t, t), -jnp.inf, x.dtype), k=1)
        penult = None
        for i in range(c.num_layers):
            if i == c.num_layers - 1:
                penult = x
            x = _CLIPLayer(c, name=f"layers_{i}")(x, causal)
        last = nn.LayerNorm(epsilon=c.layer_norm_eps,
                            name="final_layer_norm")(x)

        if c.eos_token_id == 2:
            # HF legacy path (both SD3 CLIP configs): highest token id
            eos_pos = jnp.argmax(input_ids, axis=-1)
        else:
            eos_pos = jnp.argmax(
                (input_ids == c.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = last[jnp.arange(b), eos_pos]
        proj = nn.Dense(c.projection_dim, use_bias=False,
                        name="text_projection")(pooled)
        return penult, proj


def clip_torch_path_map(path: tuple[str, ...]) -> str:
    """Flax path -> HF ``CLIPTextModelWithProjection`` dotted key prefix."""
    parts = []
    for seg in path:
        if seg.startswith("layers_"):
            parts.append("text_model.encoder.layers." + seg[len("layers_"):])
        elif seg in ("token_embedding", "position_embedding"):
            parts.append("text_model.embeddings." + seg)
        elif seg == "final_layer_norm":
            parts.append("text_model.final_layer_norm")
        elif seg.startswith("self_attn_"):
            parts.append("self_attn." + seg[len("self_attn_"):])
        elif seg.startswith("mlp_"):
            parts.append("mlp." + seg[len("mlp_"):])
        else:
            parts.append(seg)
    return ".".join(parts)


# ---------------------------------------------------------------------------
# T5 v1.1 encoder
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6


# SD3's text_encoder_3 (google/t5-v1_1-xxl encoder)
T5_XXL = T5Config()


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


def t5_relative_buckets(t: int, num_buckets: int = 32,
                        max_distance: int = 128) -> np.ndarray:
    """Bidirectional bucket table [T, T] (HF ``_relative_position_bucket``);
    host numpy — static per sequence length."""
    ctx = np.arange(t)[:, None]
    mem = np.arange(t)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    n = np.abs(rel)
    max_exact = nb // 2
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / math.log(max_distance / max_exact)
        * (nb - max_exact)).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(n < max_exact, n, large)
    return buckets


class _T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, position_bias):
        c = self.cfg
        h, dk = c.num_heads, c.d_kv
        inner = h * dk
        b, t, _ = x.shape

        ln = RMSNorm(c.layer_norm_eps, name="attention_ln")(x)

        def heads(v):
            return v.reshape(b, t, h, dk).transpose(0, 2, 1, 3)

        # T5 quirk: NO 1/sqrt(d) scaling on q
        q = heads(nn.Dense(inner, use_bias=False, name="q")(ln))
        k = heads(nn.Dense(inner, use_bias=False, name="k")(ln))
        v = heads(nn.Dense(inner, use_bias=False, name="v")(ln))
        scores = jnp.einsum("bhqc,bhkc->bhqk", q, k) + position_bias
        attn = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, inner)
        x = x + nn.Dense(c.d_model, use_bias=False, name="o")(o)

        ln2 = RMSNorm(c.layer_norm_eps, name="ffn_ln")(x)
        g = jax.nn.gelu(nn.Dense(c.d_ff, use_bias=False, name="wi_0")(ln2),
                        approximate=True)           # HF gelu_new (tanh)
        y = g * nn.Dense(c.d_ff, use_bias=False, name="wi_1")(ln2)
        x = x + nn.Dense(c.d_model, use_bias=False, name="wo")(y)
        return x


class T5Encoder(nn.Module):
    config: T5Config

    @nn.compact
    def __call__(self, input_ids):
        """ids [B, T] -> last hidden [B, T, d_model] (no attention mask,
        matching diffusers' SD3 T5 call)."""
        c = self.config
        t = input_ids.shape[1]
        x = nn.Embed(c.vocab_size, c.d_model, name="token_embedding")(
            input_ids)

        buckets = t5_relative_buckets(
            t, c.relative_attention_num_buckets,
            c.relative_attention_max_distance)
        bias_table = nn.Embed(c.relative_attention_num_buckets, c.num_heads,
                              name="rel_bias")(jnp.asarray(buckets))
        position_bias = bias_table.transpose(2, 0, 1)[None]    # [1, H, T, T]

        for i in range(c.num_layers):
            x = _T5Block(c, name=f"blocks_{i}")(x, position_bias)
        return RMSNorm(c.layer_norm_eps, name="final_layer_norm")(x)


def t5_torch_path_map(path: tuple[str, ...]) -> str:
    """Flax path -> HF ``T5EncoderModel`` dotted key prefix."""
    parts = []
    for seg in path:
        if seg.startswith("blocks_"):
            parts.append("encoder.block." + seg[len("blocks_"):])
        elif seg == "token_embedding":
            parts.append("shared")
        elif seg == "rel_bias":
            parts.append(
                "encoder.block.0.layer.0.SelfAttention"
                ".relative_attention_bias")
        elif seg == "attention_ln":
            parts.append("layer.0.layer_norm")
        elif seg in ("q", "k", "v", "o"):
            parts.append("layer.0.SelfAttention." + seg)
        elif seg == "ffn_ln":
            parts.append("layer.1.layer_norm")
        elif seg in ("wi_0", "wi_1", "wo"):
            parts.append("layer.1.DenseReluDense." + seg)
        elif seg == "final_layer_norm":
            parts.append("encoder.final_layer_norm")
        else:
            parts.append(seg)
    return ".".join(parts)


# ---------------------------------------------------------------------------
# SD3 encode_prompt
# ---------------------------------------------------------------------------


def sd3_encode_prompt(clip_l, params_l, ids_l,
                      clip_g, params_g, ids_g,
                      t5=None, params_t5=None, ids_t5=None,
                      joint_dim: int = 4096,
                      max_sequence_length: int = 256):
    """diffusers ``StableDiffusion3Pipeline.encode_prompt`` on the Flax
    encoders: returns ``(prompt_embeds [B, T_clip+T_t5, joint_dim],
    pooled [B, P_l+P_g])``.  Without T5 (the memory-light mode) diffusers
    still appends a ZERO block of ``max_sequence_length`` tokens in the T5
    span — it changes the attention normalization and keeps the context
    shape compatible with full-stack embeddings; matched here (pass
    ``max_sequence_length=0`` to disable)."""
    pl, pooled_l = clip_l.apply({"params": params_l}, ids_l)
    pg, pooled_g = clip_g.apply({"params": params_g}, ids_g)
    clip_embeds = jnp.concatenate([pl, pg], axis=-1)
    if clip_embeds.shape[-1] > joint_dim:
        raise ValueError(
            f"clip hidden concat {clip_embeds.shape[-1]} exceeds "
            f"joint_dim {joint_dim}")
    clip_embeds = jnp.pad(
        clip_embeds, ((0, 0), (0, 0), (0, joint_dim - clip_embeds.shape[-1])))
    if t5 is not None:
        t5_embeds = t5.apply({"params": params_t5}, ids_t5)
    else:
        t5_embeds = jnp.zeros(
            (clip_embeds.shape[0], max_sequence_length, joint_dim),
            clip_embeds.dtype)
    prompt = jnp.concatenate([clip_embeds, t5_embeds], axis=1)
    pooled = jnp.concatenate([pooled_l, pooled_g], axis=-1)
    return prompt, pooled
