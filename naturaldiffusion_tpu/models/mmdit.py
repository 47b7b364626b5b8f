"""MMDiT — the SD3 multimodal diffusion transformer (Flax, NHWC).

TPU-native stand-in for the diffusers ``SD3Transformer2DModel`` the reference
drives through ``StableDiffusion3Pipeline``
(``src/SD3NaturalInference.py:175-213``).  Dual-stream joint-attention
design (Esser et al., "Scaling Rectified Flow Transformers", 2024):

* latent stream: patchified 16-ch latents + 2-D sin/cos positions;
* context stream: projected text-token embeddings (CLIP+T5 concat);
* each block: per-stream adaLN-Zero modulation, ONE joint attention over
  ``[latent; context]`` tokens (diffusers sample-first order), per-stream
  MLPs; the context stream is dropped in the final block;
* conditioning vector = sinusoidal timestep embedding + pooled-text MLP.

Parameter names mirror the HF checkpoint layout (``transformer_blocks.N.*``)
via :func:`mmdit_torch_path_map`, so SD3 safetensors convert with the same
name-and-transpose machinery as the other backbones.  (diffusers itself is
not in this image — parity tests cover shape/CFG/selfconsistency; numeric
parity runs when HF weights are provided.)
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn

from .dit import QDense
import jax
import jax.numpy as jnp

import numpy as np

from .dit import timestep_embedding


def sd3_cropped_pos_embed(embed_dim: int, gh: int, gw: int,
                          max_size: int, base_size: int) -> np.ndarray:
    """diffusers ``PatchEmbed`` positions for SD3: an MAE sin/cos table over
    ``pos_embed_max_size`` with grid coords scaled by ``base_size/max_size``
    (interpolation_scale=1), CENTER-cropped to the actual grid — the crop
    offset changes the values, so generating a fresh ``gh``-table (the DiT
    convention) does NOT match the HF checkpoint's buffer."""
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    coords = np.arange(max_size, dtype=np.float32) / (max_size / base_size)
    grid = np.stack(np.meshgrid(coords, coords), axis=0)      # w first
    emb = np.concatenate([_1d(embed_dim // 2, grid[0]),
                          _1d(embed_dim // 2, grid[1])], axis=1)
    emb = emb.reshape(max_size, max_size, embed_dim)
    top = (max_size - gh) // 2
    left = (max_size - gw) // 2
    return emb[top:top + gh, left:left + gw].reshape(gh * gw, embed_dim)


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    sample_size: int = 128            # latent H=W (128 -> 1024px images)
    patch_size: int = 2
    in_channels: int = 16
    hidden_size: int = 1536           # SD3-medium: 24 * 64
    depth: int = 24
    num_heads: int = 24
    caption_projection_dim: int = 1536
    joint_attention_dim: int = 4096   # T5/CLIP concat token dim
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 192
    qk_norm: bool = False             # SD3.5 uses RMSNorm on q/k


class TimestepTextEmbed(nn.Module):
    """c = MLP(sinusoidal(t*1000-ish)) + MLP(pooled_text)
    (HF ``time_text_embed``)."""
    hidden: int

    @nn.compact
    def __call__(self, t, pooled):
        temb = timestep_embedding(t, 256)
        temb = nn.Dense(self.hidden, name="timestep_embedder_linear_1")(temb)
        temb = nn.Dense(self.hidden,
                        name="timestep_embedder_linear_2")(nn.silu(temb))
        p = nn.Dense(self.hidden, name="text_embedder_linear_1")(pooled)
        p = nn.Dense(self.hidden, name="text_embedder_linear_2")(nn.silu(p))
        return temb + p


def _fused_ln_enabled() -> bool:
    """One LN-statistics kernel per stream *pair* instead of a big+tiny pair
    per block (read at trace time; ``NATDIFF_MMDIT_FUSED_LN=0`` is the chip
    A/B control — the concat costs a copy, the fusion kills the tiny
    fixed-overhead context kernels)."""
    import os
    return os.environ.get("NATDIFF_MMDIT_FUSED_LN", "1") != "0"


class JointBlock(nn.Module):
    num_heads: int
    context_pre_only: bool = False
    qk_norm: bool = False

    @nn.compact
    def __call__(self, x, ctx, c, mods=None):
        d = x.shape[-1]
        h = self.num_heads
        hd = d // h

        n_ctx_mod = 2 if self.context_pre_only else 6
        if mods is not None:
            # schedule-precomputed adaLN vectors (mmdit_schedule_mods): the
            # [B, 1536]x[1536, 9216] modulation matmuls are MXU-starved at
            # inference batch sizes and re-read ~57 MB of weights per block
            # per step — with a static NI schedule they are loop constants
            mod_x, mod_c = mods
        else:
            # adaLN-Zero per stream (6 params; context-final block gets 2)
            mod_x = nn.Dense(6 * d, kernel_init=nn.initializers.zeros,
                             name="norm1_linear")(nn.silu(c))
            mod_c = nn.Dense(n_ctx_mod * d, kernel_init=nn.initializers.zeros,
                             name="norm1_context_linear")(nn.silu(c))
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod_x, 6, axis=-1)
        cmods = jnp.split(mod_c, n_ctx_mod, axis=-1)

        ln = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6)

        def moded(v, sh, sc):
            return v * (1 + sc[:, None, :]) + sh[:, None, :]

        def ln_pair(a, bctx):
            # LayerNorm is per-token, so normalizing the concatenated
            # streams is mathematically identical to two separate calls —
            # but ONE stats kernel over [B, T+Tc, D] instead of a big one
            # plus a tiny fixed-overhead one per block (the r3 SD3-1024
            # trace put the context-stream LN statistics at 14% of device
            # time).  Opt-out control for the chip A/B.
            if _fused_ln_enabled():
                tn = a.shape[1]
                lb = ln(jnp.concatenate([a, bctx], axis=1))
                return lb[:, :tn], lb[:, tn:]
            return ln(a), ln(bctx)

        lx, lc = ln_pair(x, ctx)
        x_in = moded(lx, sh1, sc1)
        if self.context_pre_only:
            # diffusers AdaLayerNormContinuous chunks (scale, shift) — the
            # REVERSE of AdaLayerNormZero's (shift, scale, ...) order
            c_in = moded(lc, cmods[1], cmods[0])
        else:
            c_in = moded(lc, cmods[0], cmods[1])

        def heads(v):
            b, t, _ = v.shape
            return v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)

        q = heads(QDense(d, name="attn_to_q")(x_in))
        k = heads(QDense(d, name="attn_to_k")(x_in))
        v = heads(QDense(d, name="attn_to_v")(x_in))
        cq = heads(QDense(d, name="attn_add_q_proj")(c_in))
        ck = heads(QDense(d, name="attn_add_k_proj")(c_in))
        cv = heads(QDense(d, name="attn_add_v_proj")(c_in))

        if self.qk_norm:
            # four SEPARATE norms with their own scales — diffusers SD3.5
            # has norm_q/norm_k/norm_added_q/norm_added_k; one shared
            # instance would silently leave 3 scales unconverted (ADVICE r2).
            # Cast back: the f32 scale params would otherwise promote q/k
            # (and the attention kernel) to f32 under bf16 inference.
            adt = q.dtype
            q = nn.RMSNorm(epsilon=1e-6, name="attn_norm_q")(q).astype(adt)
            k = nn.RMSNorm(epsilon=1e-6, name="attn_norm_k")(k).astype(adt)
            cq = nn.RMSNorm(epsilon=1e-6,
                            name="attn_norm_added_q")(cq).astype(adt)
            ck = nn.RMSNorm(epsilon=1e-6,
                            name="attn_norm_added_k")(ck).astype(adt)

        # joint attention over [latent; context] (diffusers order); falls
        # back to the einsum pair off-TPU or at unaligned joint lengths.
        # NOT mha_joint: the split-softmax path was A/B'd in-model on the
        # chip (r3) and LOSES — 5.31 -> 6.58 s/img at SD3-1024 — because
        # the kernel is VPU-bound (padded keys cost only masked exps) while
        # the split adds q/k/v slice copies and an f32 score pipeline for
        # the context pieces.  See PERF.md "attention pad economics".
        from ..ops.attention import mha
        t_x = x.shape[1]
        q = jnp.concatenate([q, cq], axis=2)
        k = jnp.concatenate([k, ck], axis=2)
        v = jnp.concatenate([v, cv], axis=2)
        o = mha(q, k, v)
        b, _, t_all, _ = o.shape
        o = o.transpose(0, 2, 1, 3).reshape(b, t_all, d)
        o_x, o_c = o[:, :t_x], o[:, t_x:]

        x = x + g1[:, None, :] * QDense(d, name="attn_to_out_0")(o_x)
        if self.context_pre_only:
            xm = moded(ln(x), sh2, sc2)
            ff = QDense(4 * d, name="ff_net_0_proj")(xm)
            ff = QDense(d, name="ff_net_2")(nn.gelu(ff, approximate=True))
            return x + g2[:, None, :] * ff, None

        # both residual adds first, then ONE LN stats pass over the pair
        # (pure reordering — the x FF never reads ctx and vice versa)
        ctx = ctx + cmods[2][:, None, :] * nn.Dense(
            d, name="attn_to_add_out")(o_c)
        lx2, lc2 = ln_pair(x, ctx)
        xm = moded(lx2, sh2, sc2)
        ff = QDense(4 * d, name="ff_net_0_proj")(xm)
        ff = QDense(d, name="ff_net_2")(nn.gelu(ff, approximate=True))
        x = x + g2[:, None, :] * ff
        cm = moded(lc2, cmods[3], cmods[4])
        cff = QDense(4 * d, name="ff_context_net_0_proj")(cm)
        cff = nn.Dense(d, name="ff_context_net_2")(
            nn.gelu(cff, approximate=True))
        ctx = ctx + cmods[5][:, None, :] * cff
        return x, ctx


class MMDiT(nn.Module):
    config: MMDiTConfig
    # optional NamedSharding for [B, T, D] latent tokens — Megatron-SP
    # boundary constraint applied between JointBlocks (same hook as DiT)
    token_constraint: object = None

    @nn.compact
    def __call__(self, x, t, context, pooled, mods=None):
        """x: [B, H, W, C] latents; t: [B] (sigma*1000 convention upstream);
        context: [B, T_ctx, joint_attention_dim]; pooled: [B, pooled_dim].
        Returns [B, H, W, C] (the velocity prediction).

        ``mods``: optional precomputed conditioning from
        :func:`mmdit_schedule_mods` (one step's slice).  When given, the
        timestep/pooled embedding MLPs, every block's adaLN matmul and the
        context embedder are skipped — ``t``/``pooled``/``context`` are
        ignored.  This is the NI fast path: the schedule is static, so all
        of those are loop constants hoisted out of the sampling scan."""
        cfg = self.config
        b, hh, ww, _ = x.shape
        p, d = cfg.patch_size, cfg.hidden_size
        gh, gw = hh // p, ww // p

        tok = nn.Conv(d, (p, p), strides=(p, p), padding="VALID",
                      name="pos_embed_proj")(x).reshape(b, gh * gw, d)
        # center-cropped scaled sin/cos table — bit-equal to the HF
        # checkpoint's generated pos_embed buffer (see sd3_cropped_pos_embed)
        pos = sd3_cropped_pos_embed(d, gh, gw, cfg.pos_embed_max_size,
                                    cfg.sample_size // p)
        tok = tok + jnp.asarray(pos, tok.dtype)[None]

        if mods is not None:
            c = None
            ctx = mods["ctx_emb"].astype(tok.dtype)
        else:
            # cast the conditioning vector to the stream dtype: the
            # sinusoidal timestep embedding inside TimestepTextEmbed is f32,
            # and an f32 `c` silently promotes every JointBlock's modulated
            # activations — and the joint-attention kernel — to f32 (caught
            # by the r3 xprof trace: flash_attention ran on
            # f32[2,24,4608,64]; same class as the r2 NCSN++ temb fix)
            c = TimestepTextEmbed(d, name="time_text_embed")(
                t, pooled).astype(tok.dtype)
            # same class of silent promotion via the OTHER conditioning
            # input: real text encoders emit f32 context, and an f32 ctx
            # stream promotes q/k/v (joint concat) and the latent stream
            # (x + g*Dense(o_x)) right back to f32
            ctx = nn.Dense(d, name="context_embedder")(
                context.astype(tok.dtype))

        for i in range(cfg.depth):
            if self.token_constraint is not None:
                tok = jax.lax.with_sharding_constraint(
                    tok, self.token_constraint)
            tok, ctx = JointBlock(
                cfg.num_heads, context_pre_only=(i == cfg.depth - 1),
                qk_norm=cfg.qk_norm, name=f"transformer_blocks_{i}",
            )(tok, ctx, c,
              mods=None if mods is None else mods["blocks"][i])

        if mods is not None:
            mod = mods["out"]
        else:
            mod = nn.Dense(2 * d, kernel_init=nn.initializers.zeros,
                           name="norm_out_linear")(nn.silu(c))
        # AdaLayerNormContinuous order: (scale, shift)
        scale, shift = jnp.split(mod, 2, axis=-1)
        tok = nn.LayerNorm(use_bias=False, use_scale=False,
                           epsilon=1e-6)(tok)
        tok = tok * (1 + scale[:, None, :]) + shift[:, None, :]
        tok = nn.Dense(p * p * cfg.in_channels,
                       kernel_init=nn.initializers.zeros,
                       name="proj_out")(tok)

        out = tok.reshape(b, gh, gw, p, p, cfg.in_channels)
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, gh * p, gw * p, cfg.in_channels)


def mmdit_schedule_mods(model: MMDiT, params, t_all, pooled, context,
                        dtype=None):
    """Hoist ALL schedule-dependent conditioning out of the NI sampling loop.

    With a static NI schedule every step's conditioning vector — and hence
    every block's adaLN modulation — is known before the scan starts.  The
    standard forward recomputes them per step as ``[B, 1536] x [1536, 9216]``
    matmuls: MXU-starved at inference batch sizes (M=2 for a CFG pair) and
    re-reading ~57 MB of modulation weights per block per step (~21% of
    device time in the r3 SD3-1024 profile).  Here the whole schedule runs
    as ONE ``[S*B, 1536]`` matmul per block at full MXU rate.

    Applies the model's own submodules standalone (same Flax modules, same
    param subtrees) so there is no duplicated math to drift.

    Returns ``{"blocks": ((mod_x [S,B,6d], mod_c [S,B,{2,6}d]), ...),
    "out": [S,B,2d], "ctx_emb": [B,T,d]}``.  The per-step leaves (leading
    ``S``) ride the engine's ``step_inputs``; ``ctx_emb`` is step-constant
    (the context embedder sees raw text embeddings, not the evolving
    stream) and closes over the scan body.
    """
    cfg = model.config
    d = cfg.hidden_size
    s, b = t_all.shape[0], pooled.shape[0]
    if dtype is None:
        dtype = params["context_embedder"]["kernel"].dtype

    tt = jnp.repeat(jnp.asarray(t_all, jnp.float32), b)          # [S*B]
    pp = jnp.broadcast_to(pooled[None], (s,) + pooled.shape
                          ).reshape(s * b, pooled.shape[-1])
    c = TimestepTextEmbed(d).apply(
        {"params": params["time_text_embed"]}, tt, pp).astype(dtype)
    sc = nn.silu(c)

    def dense(p, x):
        return nn.Dense(p["kernel"].shape[1]).apply({"params": p}, x)

    blocks = []
    for i in range(cfg.depth):
        bp = params[f"transformer_blocks_{i}"]
        mx = dense(bp["norm1_linear"], sc).reshape(s, b, -1)
        mc = dense(bp["norm1_context_linear"], sc).reshape(s, b, -1)
        blocks.append((mx, mc))
    out = dense(params["norm_out_linear"], sc).reshape(s, b, -1)
    # compute (and store) the hoisted context embedding in the stream dtype:
    # real text encoders emit f32 context, which would otherwise ride into
    # the scan as a full-width f32 loop constant and re-promote the streams
    ctx_emb = dense(params["context_embedder"], context.astype(dtype))
    return {"blocks": tuple(blocks), "out": out, "ctx_emb": ctx_emb}


def mmdit_cfg_fwd_mods(model: MMDiT, params, *, ctx2, pool2, t_all,
                       cfg_scale: float = 7.0):
    """CFG-fused predictor on the precomputed-conditioning fast path.

    ``ctx2``/``pool2`` are the CFG-doubled conditioning ([text ‖ null]).
    Returns ``(fwd, step_inputs)`` for the engine's ``step_inputs=`` hook —
    ``fwd(z, t, aux)`` runs the batch-doubled model and combines
    ``null + cfg_scale * (text - null)``.  The per-step adaLN mods carry a
    leading [S] and scan in; the context embedding is step-constant and
    closes over ``fwd``.  Shared by ``apps/sd3_ni.make_cfg_fwd_mods`` and
    ``SD3Pipeline`` so the hoist/CFG conventions cannot drift apart."""
    mods = mmdit_schedule_mods(model, params, t_all, pool2, ctx2)
    ctx_emb = mods.pop("ctx_emb")          # step-constant: closes over fwd
    step_inputs = mods                     # leaves carry the leading [S]

    def fwd(z, t, aux):
        b = z.shape[0]
        z2 = jnp.concatenate([z, z], axis=0)
        # timestep stays f32: bf16 would quantize ~1000-scale timesteps to
        # spacing 4, desyncing the conditioning from the f32 sigma
        # reprojection (unused under mods=, but kept for shape/trace parity)
        t2 = jnp.full((2 * b,), t, jnp.float32)
        v2 = model.apply({"params": params}, z2, t2, ctx2, pool2,
                         mods=dict(aux, ctx_emb=ctx_emb))
        text_v, null_v = v2[:b], v2[b:]
        return null_v + cfg_scale * (text_v - null_v)

    return fwd, step_inputs


SD3_MEDIUM = MMDiTConfig()


def mmdit_torch_path_map(path: tuple[str, ...]) -> str:
    """Flax path -> HF SD3Transformer2DModel dotted key."""
    parts = []
    for seg in path:
        if seg.startswith("transformer_blocks_"):
            parts.append("transformer_blocks."
                         + seg[len("transformer_blocks_"):])
        elif seg == "pos_embed_proj":
            parts.append("pos_embed.proj")
        elif seg == "time_text_embed":
            parts.append("time_text_embed")
        elif seg.startswith("timestep_embedder_linear_"):
            parts.append("timestep_embedder.linear_" + seg[-1])
        elif seg.startswith("text_embedder_linear_"):
            parts.append("text_embedder.linear_" + seg[-1])
        elif seg == "norm1_linear":
            parts.append("norm1.linear")
        elif seg == "norm1_context_linear":
            parts.append("norm1_context.linear")
        elif seg.startswith("attn_to_out_0"):
            parts.append("attn.to_out.0")
        elif seg.startswith("attn_to_add_out"):
            parts.append("attn.to_add_out")
        elif seg.startswith("attn_norm_"):
            # SD3.5 qk-norm: attn.norm_q / norm_k / norm_added_q / norm_added_k
            parts.append("attn." + seg[len("attn_"):])
        elif seg.startswith("attn_add_"):
            parts.append("attn." + seg[len("attn_"):])
        elif seg.startswith("attn_to_"):
            parts.append("attn." + seg[len("attn_"):])
        elif seg == "ff_net_0_proj":
            parts.append("ff.net.0.proj")
        elif seg == "ff_net_2":
            parts.append("ff.net.2")
        elif seg == "ff_context_net_0_proj":
            parts.append("ff_context.net.0.proj")
        elif seg == "ff_context_net_2":
            parts.append("ff_context.net.2")
        elif seg == "norm_out_linear":
            parts.append("norm_out.linear")
        else:
            parts.append(seg)
    return ".".join(parts)
