"""Random-init torch twin of diffusers' ``SD3Transformer2DModel``.

diffusers is not in this image, so this twin reconstructs the architecture
in plain ``torch.nn`` with diffusers' parameter names (state_dict keys match
the SD3 safetensors layout), faithfully including:

* PatchEmbed with a ``pos_embed_max_size`` scaled sin/cos table,
  center-cropped (``cropped_pos_embed``);
* ``Timesteps(256, flip_sin_to_cos=True, downscale_freq_shift=0)`` +
  two-layer MLPs for timestep and pooled text;
* JointTransformerBlock: AdaLayerNormZero per stream (context-final block
  gets AdaLayerNormContinuous with its REVERSED (scale, shift) chunk
  order), one joint attention over [sample; context], gelu-tanh FFNs;
* AdaLayerNormContinuous ``norm_out`` + linear ``proj_out`` + unpatchify.

Test-support only.
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def mae_pos_embed(embed_dim, max_size, base_size):
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    coords = np.arange(max_size, dtype=np.float32) / (max_size / base_size)
    grid = np.stack(np.meshgrid(coords, coords), axis=0)
    emb = np.concatenate([_1d(embed_dim // 2, grid[0]),
                          _1d(embed_dim // 2, grid[1])], axis=1)
    return emb.reshape(max_size, max_size, embed_dim)


class PatchEmbedT(nn.Module):
    def __init__(self, patch, cin, dim, max_size, base_size):
        super().__init__()
        self.proj = nn.Conv2d(cin, dim, patch, stride=patch)
        self.max_size = max_size
        self.table = torch.from_numpy(
            mae_pos_embed(dim, max_size, base_size)).float()
        self.patch = patch

    def forward(self, x):                      # x: [B, C, H, W]
        b = x.shape[0]
        y = self.proj(x)                       # [B, D, gh, gw]
        gh, gw = y.shape[2], y.shape[3]
        y = y.flatten(2).transpose(1, 2)       # [B, gh*gw, D]
        top = (self.max_size - gh) // 2
        left = (self.max_size - gw) // 2
        pos = self.table[top:top + gh, left:left + gw].reshape(gh * gw, -1)
        return y + pos[None]


class TimestepTextEmbedT(nn.Module):
    def __init__(self, dim, pooled_dim):
        super().__init__()
        self.timestep_embedder = nn.ModuleDict({
            "linear_1": nn.Linear(256, dim), "linear_2": nn.Linear(dim, dim)})
        self.text_embedder = nn.ModuleDict({
            "linear_1": nn.Linear(pooled_dim, dim),
            "linear_2": nn.Linear(dim, dim)})

    @staticmethod
    def timesteps(t, dim=256):
        half = dim // 2
        freqs = torch.exp(-math.log(10000)
                          * torch.arange(half, dtype=torch.float32) / half)
        args = t.float()[:, None] * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def forward(self, t, pooled):
        te = self.timesteps(t)
        te = self.timestep_embedder["linear_2"](
            F.silu(self.timestep_embedder["linear_1"](te)))
        pe = self.text_embedder["linear_2"](
            F.silu(self.text_embedder["linear_1"](pooled)))
        return te + pe


class RMSNormT(nn.Module):
    """diffusers RMSNorm (qk-norm over the head dim, learnable weight)."""

    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(var + self.eps)).to(x.dtype) \
            * self.weight


class AttnT(nn.Module):
    def __init__(self, dim, heads, pre_only, qk_norm=False):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.add_q_proj = nn.Linear(dim, dim)
        self.add_k_proj = nn.Linear(dim, dim)
        self.add_v_proj = nn.Linear(dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        if not pre_only:
            self.to_add_out = nn.Linear(dim, dim)
        if qk_norm:          # SD3.5: four SEPARATE norms (ADVICE r2)
            hd = dim // heads
            self.norm_q = RMSNormT(hd)
            self.norm_k = RMSNormT(hd)
            self.norm_added_q = RMSNormT(hd)
            self.norm_added_k = RMSNormT(hd)

    def forward(self, x, ctx):
        b, tx, d = x.shape
        h = self.heads

        def heads(v):
            return v.reshape(b, -1, h, d // h).transpose(1, 2)

        q, k = heads(self.to_q(x)), heads(self.to_k(x))
        cq, ck = heads(self.add_q_proj(ctx)), heads(self.add_k_proj(ctx))
        if hasattr(self, "norm_q"):
            q, k = self.norm_q(q), self.norm_k(k)
            cq, ck = self.norm_added_q(cq), self.norm_added_k(ck)
        q = torch.cat([q, cq], 2)
        k = torch.cat([k, ck], 2)
        v = torch.cat([heads(self.to_v(x)), heads(self.add_v_proj(ctx))], 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, -1, d)
        ox, oc = o[:, :tx], o[:, tx:]
        ox = self.to_out[0](ox)
        if hasattr(self, "to_add_out"):
            oc = self.to_add_out(oc)
        return ox, oc


class FeedForwardT(nn.Module):
    def __init__(self, dim):
        super().__init__()
        proj = nn.Linear(dim, 4 * dim)
        self.net = nn.ModuleList(
            [nn.ModuleDict({"proj": proj}), nn.Identity(),
             nn.Linear(4 * dim, dim)])

    def forward(self, x):
        return self.net[2](F.gelu(self.net[0]["proj"](x),
                                  approximate="tanh"))


class JointBlockT(nn.Module):
    def __init__(self, dim, heads, pre_only, qk_norm=False):
        super().__init__()
        self.pre_only = pre_only
        self.norm1 = nn.ModuleDict({"linear": nn.Linear(dim, 6 * dim)})
        self.norm1_context = nn.ModuleDict({
            "linear": nn.Linear(dim, (2 if pre_only else 6) * dim)})
        self.attn = AttnT(dim, heads, pre_only, qk_norm=qk_norm)
        self.ff = FeedForwardT(dim)
        if not pre_only:
            self.ff_context = FeedForwardT(dim)
        self.ln = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, ctx, temb):
        mods = self.norm1["linear"](F.silu(temb)).chunk(6, dim=1)
        sh1, sc1, g1, sh2, sc2, g2 = [m[:, None] for m in mods]
        if self.pre_only:
            csc, csh = [m[:, None] for m in
                        self.norm1_context["linear"](F.silu(temb)).chunk(2, 1)]
            c_in = self.ln(ctx) * (1 + csc) + csh
        else:
            cm = [m[:, None] for m in
                  self.norm1_context["linear"](F.silu(temb)).chunk(6, 1)]
            c_in = self.ln(ctx) * (1 + cm[1]) + cm[0]
        x_in = self.ln(x) * (1 + sc1) + sh1

        ax, ac = self.attn(x_in, c_in)
        x = x + g1 * ax
        xm = self.ln(x) * (1 + sc2) + sh2
        x = x + g2 * self.ff(xm)
        if self.pre_only:
            return x, None
        ctx = ctx + cm[2] * ac
        cmm = self.ln(ctx) * (1 + cm[4]) + cm[3]
        ctx = ctx + cm[5] * self.ff_context(cmm)
        return x, ctx


class TorchMMDiT(nn.Module):
    """Tiny SD3Transformer2DModel twin (state_dict keys = HF layout)."""

    def __init__(self, sample_size=8, patch=2, cin=4, dim=64, depth=2,
                 heads=4, ctx_dim=32, pooled_dim=48, max_size=8,
                 qk_norm=False):
        super().__init__()
        self.patch, self.cin = patch, cin
        self.pos_embed = PatchEmbedT(patch, cin, dim, max_size,
                                     sample_size // patch)
        self.time_text_embed = TimestepTextEmbedT(dim, pooled_dim)
        self.context_embedder = nn.Linear(ctx_dim, dim)
        self.transformer_blocks = nn.ModuleList(
            [JointBlockT(dim, heads, pre_only=(i == depth - 1),
                         qk_norm=qk_norm)
             for i in range(depth)])
        self.norm_out = nn.ModuleDict({"linear": nn.Linear(dim, 2 * dim)})
        self.proj_out = nn.Linear(dim, patch * patch * cin)
        self.ln = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    @torch.no_grad()
    def forward(self, x, t, ctx, pooled):     # x: [B, C, H, W]
        b, _, hh, ww = x.shape
        p = self.patch
        gh, gw = hh // p, ww // p
        tok = self.pos_embed(x)
        temb = self.time_text_embed(t, pooled)
        c = self.context_embedder(ctx)
        for blk in self.transformer_blocks:
            tok, c = blk(tok, c, temb)
        scale, shift = self.norm_out["linear"](F.silu(temb)).chunk(2, 1)
        tok = self.ln(tok) * (1 + scale[:, None]) + shift[:, None]
        tok = self.proj_out(tok)
        out = tok.reshape(b, gh, gw, p, p, self.cin)
        out = torch.einsum("nhwpqc->nchpwq", out)
        return out.reshape(b, self.cin, gh * p, gw * p)
