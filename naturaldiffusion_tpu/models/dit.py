"""DiT — Diffusion Transformer (Flax, NHWC), all 12 size variants.

TPU-native rebuild of ``deps/DiT/models.py:27-372`` (DiT-XL/2 is the
ImageNet-256 backbone used by ``src/ValidateNaturalInference.py:336-343``).

Design notes (TPU-first):
* tokens stay ``[B, T, D]`` with heads split only inside attention — the QKV
  and MLP matmuls are the MXU hot path and shard over a 2-D
  ``('data','model')`` mesh (see :mod:`naturaldiffusion_tpu.parallel`);
* the fixed 2-D sin/cos positional table is a compile-time constant, not a
  parameter (the reference stores it as a frozen buffer);
* CFG is the batch-doubled single call with the reference's
  guide-only-``in_channels`` quirk (``deps/DiT/models.py:255-272``).
"""

from __future__ import annotations

import dataclasses
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def timestep_embedding(t, dim: int, max_period: int = 10000):
    """GLIDE-style sinusoidal embedding, cos-first
    (``deps/DiT/models.py:40-60``; note the /half denominator and cos||sin
    order — both differ from the score-SDE embedding)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """MAE 2-D sin/cos table (``deps/DiT/models.py:279-330``)."""
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)   # w first
    emb_h = _1d(embed_dim // 2, grid[0])
    emb_w = _1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def modulate(x, shift, scale):
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


class QDense(nn.Module):
    """``nn.Dense`` twin (same param tree) with a weight-only-int8 path.

    Under ``NATDIFF_QUANT=w8`` the kernel is per-channel-quantized in-graph
    (loop-invariant → LICM hoists the int8 tensor out of the NI scan) and
    the matmul runs as the Pallas dequant-in-VMEM kernel
    (:mod:`naturaldiffusion_tpu.ops.qmatmul`) — the weight-read-bound
    transformer step reads HALF the bytes.  Float path bit-matches
    ``nn.Dense`` otherwise."""
    features: int
    use_bias: bool = True
    kernel_init: object = nn.initializers.lecun_normal()
    param_dtype: object = jnp.float32          # nn.Dense's default

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", self.kernel_init,
                       (x.shape[-1], self.features), self.param_dtype)
        b = (self.param("bias", nn.initializers.zeros, (self.features,),
                        self.param_dtype)
             if self.use_bias else None)
        dt = jnp.result_type(x, k, *(() if b is None else (b,)))
        x, k = x.astype(dt), k.astype(dt)
        b = None if b is None else b.astype(dt)
        import os
        if os.environ.get("NATDIFF_QUANT", "") == "w8":
            from ..ops.qmatmul import matmul_wdq, qmatmul_ok
            from ..ops.quant import quantize_weight
            m = 1
            for dd in x.shape[:-1]:
                m *= dd
            if qmatmul_ok(m, x.shape[-1], self.features):
                w_i8, s_w = quantize_weight(k, axis=-1)
                return matmul_wdq(x, w_i8, s_w.reshape(-1), b)
        y = x @ k
        return y if b is None else y + b


class Attention(nn.Module):
    """timm-style multi-head attention (qkv_bias=True, no attn/proj drop);
    rides the Pallas flash kernel on TPU (``ops/attention.py``).
    ``attn_backend="ring"`` + ``mesh`` keeps K/V token-sharded and rotates
    them over ICI (sequence-parallel long-context path)."""
    num_heads: int
    attn_backend: str = "auto"
    mesh: object = None

    @nn.compact
    def __call__(self, x):
        from ..ops.attention import mha
        b, t, d = x.shape
        h = self.num_heads
        qkv = QDense(3 * d, use_bias=True, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, t, 3, h, d // h), 3, axis=2)
        q, k, v = (a.squeeze(2).transpose(0, 2, 1, 3) for a in (q, k, v))
        y = mha(q, k, v, backend=self.attn_backend, mesh=self.mesh)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, d)
        return QDense(d, use_bias=True, name="proj")(y)


class Mlp(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = QDense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=True)
        return QDense(d, name="fc2")(x)


class DiTBlock(nn.Module):
    """adaLN-Zero block (``deps/DiT/models.py:105-126``)."""
    num_heads: int
    mlp_ratio: float = 4.0
    attn_backend: str = "auto"
    mesh: object = None

    @nn.compact
    def __call__(self, x, c, mods=None):
        d = x.shape[-1]
        if mods is not None:
            # schedule-precomputed adaLN vector (dit_schedule_mods): with a
            # static NI schedule the [B, d]x[d, 6d] modulation matmul is a
            # loop constant — at inference batch sizes it is MXU-starved
            # and its weights are ~1/3 of DiT's per-step HBM reads
            mod = mods
        else:
            mod = nn.Dense(6 * d, kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           name="adaLN_modulation_1")(nn.silu(c))
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = jnp.split(mod, 6, axis=-1)
        ln = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)
        x = x + g_a[:, None, :] * Attention(
            self.num_heads, attn_backend=self.attn_backend, mesh=self.mesh,
            name="attn")(modulate(ln(x), sh_a, sc_a))
        x = x + g_m[:, None, :] * Mlp(int(d * self.mlp_ratio), name="mlp")(
            modulate(ln(x), sh_m, sc_m))
        return x


class FinalLayer(nn.Module):
    patch_size: int
    out_channels: int

    @nn.compact
    def __call__(self, x, c, mods=None):
        d = x.shape[-1]
        if mods is not None:
            mod = mods
        else:
            mod = nn.Dense(2 * d, kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           name="adaLN_modulation_1")(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = modulate(nn.LayerNorm(use_bias=False, use_scale=False,
                                  epsilon=1e-6)(x), shift, scale)
        return nn.Dense(self.patch_size ** 2 * self.out_channels,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="linear")(x)


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    input_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = True

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels


class DiT(nn.Module):
    config: DiTConfig
    # Megatron-SP: a ready NamedSharding for [B, T, D] tokens; when set, a
    # sharding constraint is applied at every block boundary so XLA gathers
    # the sequence into the TP matmuls and scatters it back (SURVEY.md §2.5)
    token_constraint: object = None
    # "ring" + mesh: sequence-parallel ring attention — K/V never gathered,
    # blocks rotate over ICI (ops/ring_attention.py); the long-context path
    attn_backend: str = "auto"
    mesh: object = None

    @nn.compact
    def __call__(self, x, t, y, *, train: bool = False, rng=None,
                 mods=None):
        """x: [B, H, W, C] (NHWC); t: [B]; y: [B] int labels.
        Returns [B, H, W, out_channels].

        ``mods``: optional precomputed conditioning from
        :func:`dit_schedule_mods` (one step's slice); when given, the
        timestep/label embedders and every adaLN matmul are skipped —
        ``t``/``y`` are ignored (inference fast path; the NI schedule and
        labels are loop constants)."""
        cfg = self.config
        b, hh, ww, cin = x.shape
        p, d = cfg.patch_size, cfg.hidden_size
        gh, gw = hh // p, ww // p

        # patchify: conv pxp stride p == reshape + dense; keep the conv form
        # (named `proj`) for checkpoint compatibility
        tok = nn.Conv(d, (p, p), strides=(p, p), padding="VALID",
                      name="x_embedder_proj")(x).reshape(b, gh * gw, d)
        pos = jnp.asarray(get_2d_sincos_pos_embed(d, gh), tok.dtype)
        tok = tok + pos[None]

        if mods is not None:
            c = None
        else:
            temb = timestep_embedding(t, 256)
            temb = nn.Dense(d, name="t_embedder_mlp_0")(temb)
            temb = nn.Dense(d, name="t_embedder_mlp_2")(nn.silu(temb))

            n_embed = cfg.num_classes + (1 if cfg.class_dropout_prob > 0
                                         else 0)
            if train and cfg.class_dropout_prob > 0:
                rng = rng if rng is not None else self.make_rng(
                    "label_dropout")
                drop = jax.random.uniform(rng, (b,)) < cfg.class_dropout_prob
                y = jnp.where(drop, cfg.num_classes, y)
            yemb = nn.Embed(n_embed, d,
                            embedding_init=nn.initializers.normal(0.02),
                            name="y_embedder_embedding_table")(y)
            # the sinusoidal embedding is f32; without this cast the adaLN
            # modulation promotes EVERY block's activations (and the
            # attention kernel) to f32 — the same silent-promotion class the
            # r2 NCSN++ bf16 fix closed (PERF.md "bf16 actually end-to-end")
            c = (temb + yemb).astype(tok.dtype)

        for i in range(cfg.depth):
            if self.token_constraint is not None:
                tok = jax.lax.with_sharding_constraint(
                    tok, self.token_constraint)
            tok = DiTBlock(cfg.num_heads, cfg.mlp_ratio,
                           attn_backend=self.attn_backend, mesh=self.mesh,
                           name=f"blocks_{i}")(
                tok, c, mods=None if mods is None else mods["blocks"][i])
        tok = FinalLayer(p, cfg.out_channels, name="final_layer")(
            tok, c, mods=None if mods is None else mods["final"])

        # unpatchify -> NHWC
        out = tok.reshape(b, gh, gw, p, p, cfg.out_channels)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, gh * p, gw * p, cfg.out_channels)
        return out


def dit_schedule_mods(model: DiT, params, t_all, y, dtype=None):
    """Hoist DiT's schedule-dependent conditioning out of the NI loop.

    Same design as ``mmdit_schedule_mods``: with a static NI schedule (and
    fixed class labels) the conditioning vector ``c = temb(t) + yemb(y)``
    and every block's adaLN modulation are loop constants.  At DiT-XL/2's
    inference batch sizes the per-step modulation matmuls are MXU-starved
    AND their weights (28 x [1152, 6912] ~ 446 MB bf16) are ~1/3 of the
    step's total HBM weight reads, so the hoist attacks the weight-read
    floor directly.  Applies the model's own submodules standalone — no
    duplicated math.

    ``t_all``: [S] schedule times; ``y``: [B] int labels (the CFG-doubled
    vector, reference convention).  Returns ``{"blocks": (mod [S,B,6d],
    ...), "final": [S,B,2d]}`` for the engine's ``step_inputs=`` hook.
    """
    cfg = model.config
    d = cfg.hidden_size
    s, b = t_all.shape[0], y.shape[0]
    if dtype is None:
        dtype = params["x_embedder_proj"]["kernel"].dtype

    temb = timestep_embedding(jnp.asarray(t_all, jnp.float32), 256)
    for name in ("t_embedder_mlp_0", "t_embedder_mlp_2"):
        p = params[name]
        if name.endswith("_2"):
            temb = nn.silu(temb)
        temb = nn.Dense(p["kernel"].shape[1]).apply({"params": p}, temb)
    table = params["y_embedder_embedding_table"]["embedding"]
    yemb = nn.Embed(table.shape[0], table.shape[1]).apply(
        {"params": params["y_embedder_embedding_table"]}, y)
    c = (temb[:, None, :] + yemb[None]).astype(dtype)       # [S, B, d]
    sc = nn.silu(c).reshape(s * b, d)

    def dense(p, x):
        return nn.Dense(p["kernel"].shape[1]).apply({"params": p}, x)

    blocks = tuple(
        dense(params[f"blocks_{i}"]["adaLN_modulation_1"], sc
              ).reshape(s, b, -1)
        for i in range(cfg.depth))
    final = dense(params["final_layer"]["adaLN_modulation_1"], sc
                  ).reshape(s, b, -1)
    return {"blocks": blocks, "final": final}


def forward_with_cfg(apply_fn, x, t, y, cfg_scale: float, in_channels: int):
    """The reference CFG wrapper, channels-last (``deps/DiT/models.py:255-272``):
    duplicates the first half of the batch, guides only the first
    ``in_channels`` output channels (eps), passes the rest (sigma) through."""
    half = x[: x.shape[0] // 2]
    combined = jnp.concatenate([half, half], axis=0)
    out = apply_fn(combined, t, y)
    eps, rest = out[..., :in_channels], out[..., in_channels:]
    cond, uncond = jnp.split(eps, 2, axis=0)
    half_eps = uncond + cfg_scale * (cond - uncond)
    eps = jnp.concatenate([half_eps, half_eps], axis=0)
    return jnp.concatenate([eps, rest], axis=-1)


def _cfg(**kw) -> DiTConfig:
    return DiTConfig(**kw)


DIT_CONFIGS: dict[str, DiTConfig] = {
    "DiT-XL/2": _cfg(depth=28, hidden_size=1152, patch_size=2, num_heads=16),
    "DiT-XL/4": _cfg(depth=28, hidden_size=1152, patch_size=4, num_heads=16),
    "DiT-XL/8": _cfg(depth=28, hidden_size=1152, patch_size=8, num_heads=16),
    "DiT-L/2": _cfg(depth=24, hidden_size=1024, patch_size=2, num_heads=16),
    "DiT-L/4": _cfg(depth=24, hidden_size=1024, patch_size=4, num_heads=16),
    "DiT-L/8": _cfg(depth=24, hidden_size=1024, patch_size=8, num_heads=16),
    "DiT-B/2": _cfg(depth=12, hidden_size=768, patch_size=2, num_heads=12),
    "DiT-B/4": _cfg(depth=12, hidden_size=768, patch_size=4, num_heads=12),
    "DiT-B/8": _cfg(depth=12, hidden_size=768, patch_size=8, num_heads=12),
    "DiT-S/2": _cfg(depth=12, hidden_size=384, patch_size=2, num_heads=6),
    "DiT-S/4": _cfg(depth=12, hidden_size=384, patch_size=4, num_heads=6),
    "DiT-S/8": _cfg(depth=12, hidden_size=384, patch_size=8, num_heads=6),
}


def dit_torch_path_map(path: tuple[str, ...]) -> str:
    """Flax path -> torch dotted key for DiT checkpoints
    (``DiT-XL-2-256x256.pt`` layout)."""
    parts = []
    for seg in path:
        if seg.startswith("blocks_"):
            parts.append("blocks." + seg[len("blocks_"):])
        elif seg == "x_embedder_proj":
            parts.append("x_embedder.proj")
        elif seg == "t_embedder_mlp_0":
            parts.append("t_embedder.mlp.0")
        elif seg == "t_embedder_mlp_2":
            parts.append("t_embedder.mlp.2")
        elif seg == "y_embedder_embedding_table":
            parts.append("y_embedder.embedding_table")
        elif seg == "adaLN_modulation_1":
            parts.append("adaLN_modulation.1")
        else:
            parts.append(seg)
    return ".".join(parts)
