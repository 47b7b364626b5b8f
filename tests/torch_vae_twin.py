"""Random-init torch twin of diffusers' ``AutoencoderKL`` (SD/SD3 VAE).

Plain ``torch.nn`` reconstruction with diffusers' parameter names
(SD3-era layout: attention q/k/v as Linear ``to_q``/``to_k``/``to_v``,
``to_out.0``).  Test-support only — pins the flax port's numerics and the
converter path without diffusers in the image.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def _gn(c):
    return nn.GroupNorm(32, c, eps=1e-6)


class ResnetBlockT(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = _gn(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = _gn(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class AttnBlockT(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = _gn(c)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).flatten(2).transpose(1, 2)   # [B, HW, C]
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        attn = torch.softmax(q @ k.transpose(1, 2) / c ** 0.5, dim=-1)
        y = self.to_out[0](attn @ v)
        return x + y.transpose(1, 2).reshape(b, c, h, w)


class _Down(nn.Module):
    def __init__(self, cin, cout, layers, downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlockT(cin if j == 0 else cout, cout)
             for j in range(layers)])
        if downsample:
            self.downsamplers = nn.ModuleList(
                [nn.ModuleDict({"conv": nn.Conv2d(cout, cout, 3, stride=2)})])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "downsamplers"):
            x = F.pad(x, (0, 1, 0, 1))
            x = self.downsamplers[0]["conv"](x)
        return x


class _Up(nn.Module):
    def __init__(self, cin, cout, layers, upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlockT(cin if j == 0 else cout, cout)
             for j in range(layers + 1)])
        if upsample:
            self.upsamplers = nn.ModuleList(
                [nn.ModuleDict({"conv": nn.Conv2d(cout, cout, 3, padding=1)})])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "upsamplers"):
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = self.upsamplers[0]["conv"](x)
        return x


class _Mid(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = nn.ModuleList([ResnetBlockT(c, c), ResnetBlockT(c, c)])
        self.attentions = nn.ModuleList([AttnBlockT(c)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class EncoderT(nn.Module):
    def __init__(self, cin, ch, mults, layers, zc):
        super().__init__()
        self.conv_in = nn.Conv2d(cin, ch, 3, padding=1)
        blocks = []
        c = ch
        for i, m in enumerate(mults):
            blocks.append(_Down(c, ch * m, layers, i != len(mults) - 1))
            c = ch * m
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = _Mid(c)
        self.conv_norm_out = _gn(c)
        self.conv_out = nn.Conv2d(c, 2 * zc, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class DecoderT(nn.Module):
    def __init__(self, cout, ch, mults, layers, zc):
        super().__init__()
        rmults = list(reversed(mults))
        c = ch * rmults[0]
        self.conv_in = nn.Conv2d(zc, c, 3, padding=1)
        self.mid_block = _Mid(c)
        blocks = []
        for i, m in enumerate(rmults):
            blocks.append(_Up(c, ch * m, layers, i != len(rmults) - 1))
            c = ch * m
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = _gn(c)
        self.conv_out = nn.Conv2d(c, cout, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for b in self.up_blocks:
            x = b(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TorchAutoencoderKL(nn.Module):
    def __init__(self, cin=3, ch=32, mults=(1, 2), layers=2, zc=4):
        super().__init__()
        self.encoder = EncoderT(cin, ch, mults, layers, zc)
        self.decoder = DecoderT(cin, ch, mults, layers, zc)
        self.quant_conv = nn.Conv2d(2 * zc, 2 * zc, 1)
        self.post_quant_conv = nn.Conv2d(zc, zc, 1)

    @torch.no_grad()
    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    @torch.no_grad()
    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
