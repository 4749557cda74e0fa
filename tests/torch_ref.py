"""Minimal PyTorch implementations following diffusers' SD conventions.

Used ONLY by the interop parity tests: these modules reproduce the exact
compute and state-dict naming of diffusers' AutoencoderKL /
UNet2DConditionModel (the models the reference loads from HuggingFace) so
we can check that emox.interop imports produce numerically identical
forward passes — the "latent MSE vs PyTorch reference" requirement —
without network access to the real checkpoints.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding_torch(t: torch.Tensor, dim: int) -> torch.Tensor:
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)  # flip_sin_to_cos=True


class TResnetBlock(nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim=None, groups=8):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_dim:
            self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        skip = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return skip + h


class TVAEAttention(nn.Module):
    def __init__(self, ch, groups=8):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        t = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(t), self.to_k(t), self.to_v(t)
        a = torch.softmax(q @ k.transpose(1, 2) / math.sqrt(c), dim=-1) @ v
        return x + self.to_out[0](a).transpose(1, 2).reshape(b, c, h, w)


class TTransformerBlock(nn.Module):
    def __init__(self, dim, heads, cross_dim):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = self._attn(dim, dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = self._attn(dim, cross_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = nn.Module()
        self.ff.net = nn.ModuleList([nn.Module(), nn.Identity(), nn.Linear(4 * dim, dim)])
        self.ff.net[0].proj = nn.Linear(dim, 8 * dim)

    @staticmethod
    def _attn(dim, kv_dim):
        m = nn.Module()
        m.to_q = nn.Linear(dim, dim, bias=False)
        m.to_k = nn.Linear(kv_dim, dim, bias=False)
        m.to_v = nn.Linear(kv_dim, dim, bias=False)
        m.to_out = nn.ModuleList([nn.Linear(dim, dim)])
        return m

    def _run_attn(self, m, x, ctx):
        b, l, d = x.shape
        h = self.heads
        q = m.to_q(x).reshape(b, -1, h, d // h).transpose(1, 2)
        k = m.to_k(ctx).reshape(b, -1, h, d // h).transpose(1, 2)
        v = m.to_v(ctx).reshape(b, -1, h, d // h).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(2, 3) / math.sqrt(d // h), dim=-1) @ v
        return m.to_out[0](a.transpose(1, 2).reshape(b, l, d))

    def forward(self, x, ctx):
        x = x + self._run_attn(self.attn1, self.norm1(x), self.norm1(x))
        x = x + self._run_attn(self.attn2, self.norm2(x), ctx)
        h = self.ff.net[0].proj(self.norm3(x))
        a, gate = h.chunk(2, dim=-1)
        x = x + self.ff.net[2](a * F.gelu(gate))
        return x


class TSpatialTransformer(nn.Module):
    def __init__(self, dim, heads, cross_dim, groups=8):
        super().__init__()
        self.norm = nn.GroupNorm(groups, dim)
        self.proj_in = nn.Linear(dim, dim)
        self.transformer_blocks = nn.ModuleList([TTransformerBlock(dim, heads, cross_dim)])
        self.proj_out = nn.Linear(dim, dim)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        t = self.norm(x).reshape(b, c, h * w).transpose(1, 2)
        t = self.proj_in(t)
        for blk in self.transformer_blocks:
            t = blk(t, ctx)
        t = self.proj_out(t)
        return res + t.transpose(1, 2).reshape(b, c, h, w)


class TDownsample(nn.Module):
    def __init__(self, ch, padding=1):
        super().__init__()
        self.pad = padding
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=padding)

    def forward(self, x):
        if self.pad == 0:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class TUpsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class TMiniVAE(nn.Module):
    """diffusers AutoencoderKL naming, small config."""

    def __init__(self, chans=(16, 32), num_res=1, groups=4, latent=4):
        super().__init__()
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(3, chans[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        for i, ch in enumerate(chans):
            blk = nn.Module()
            prev = chans[max(i - 1, 0)]
            blk.resnets = nn.ModuleList(
                [TResnetBlock(prev if j == 0 else ch, ch, None, groups) for j in range(num_res)]
            )
            if i < len(chans) - 1:
                blk.downsamplers = nn.ModuleList([TDownsample(ch, padding=0)])
            enc.down_blocks.append(blk)
        enc.mid_block = nn.Module()
        enc.mid_block.resnets = nn.ModuleList([TResnetBlock(chans[-1], chans[-1], None, groups) for _ in range(2)])
        enc.mid_block.attentions = nn.ModuleList([TVAEAttention(chans[-1], groups)])
        enc.conv_norm_out = nn.GroupNorm(groups, chans[-1])
        enc.conv_out = nn.Conv2d(chans[-1], 2 * latent, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = nn.Conv2d(latent, latent, 1)
        dec = nn.Module()
        dec.conv_in = nn.Conv2d(latent, chans[-1], 3, padding=1)
        dec.mid_block = nn.Module()
        dec.mid_block.resnets = nn.ModuleList([TResnetBlock(chans[-1], chans[-1], None, groups) for _ in range(2)])
        dec.mid_block.attentions = nn.ModuleList([TVAEAttention(chans[-1], groups)])
        dec.up_blocks = nn.ModuleList()
        rev = list(reversed(chans))
        for k, ch in enumerate(rev):
            blk = nn.Module()
            prev = rev[max(k - 1, 0)]
            blk.resnets = nn.ModuleList(
                [TResnetBlock(prev if j == 0 else ch, ch, None, groups) for j in range(num_res + 1)]
            )
            if k < len(chans) - 1:
                blk.upsamplers = nn.ModuleList([TUpsample(ch)])
            dec.up_blocks.append(blk)
        dec.conv_norm_out = nn.GroupNorm(groups, chans[0])
        dec.conv_out = nn.Conv2d(chans[0], 3, 3, padding=1)
        self.decoder = dec

    def encode_moments(self, x):
        h = self.encoder.conv_in(x)
        for blk in self.encoder.down_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = self.encoder.mid_block.resnets[0](h)
        h = self.encoder.mid_block.attentions[0](h)
        h = self.encoder.mid_block.resnets[1](h)
        h = self.encoder.conv_out(F.silu(self.encoder.conv_norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z):
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid_block.resnets[0](h)
        h = self.decoder.mid_block.attentions[0](h)
        h = self.decoder.mid_block.resnets[1](h)
        for blk in self.decoder.up_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.decoder.conv_out(F.silu(self.decoder.conv_norm_out(h)))


class TMiniUNet(nn.Module):
    """diffusers UNet2DConditionModel naming, small config, attention at
    every level, layers_per_block resnets, temb 'add' mode, heads fixed."""

    def __init__(self, chans=(16, 32), layers=1, groups=4, heads=2, cross_dim=16, in_ch=4,
                 attn_levels=None):
        super().__init__()
        self.chans = chans
        # attn_levels: which resolution levels get spatial transformers
        # (SD-1.5: (0, 1, 2) of 4 — the deepest level is attention-free)
        self.attn_levels = tuple(range(len(chans))) if attn_levels is None else tuple(attn_levels)
        temb = 4 * chans[0]
        self.conv_in = nn.Conv2d(in_ch, chans[0], 3, padding=1)
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(chans[0], temb)
        self.time_embedding.linear_2 = nn.Linear(temb, temb)
        self.down_blocks = nn.ModuleList()
        for i, ch in enumerate(chans):
            blk = nn.Module()
            prev = chans[max(i - 1, 0)]
            blk.resnets = nn.ModuleList(
                [TResnetBlock(prev if j == 0 else ch, ch, temb, groups) for j in range(layers)]
            )
            if i in self.attn_levels:
                blk.attentions = nn.ModuleList(
                    [TSpatialTransformer(ch, heads, cross_dim, groups) for _ in range(layers)]
                )
            if i < len(chans) - 1:
                blk.downsamplers = nn.ModuleList([TDownsample(ch, padding=1)])
            self.down_blocks.append(blk)
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList([TResnetBlock(chans[-1], chans[-1], temb, groups) for _ in range(2)])
        self.mid_block.attentions = nn.ModuleList([TSpatialTransformer(chans[-1], heads, cross_dim, groups)])
        self.up_blocks = nn.ModuleList()
        rev = list(reversed(chans))
        for k, ch in enumerate(rev):
            blk = nn.Module()
            prev_out = rev[max(k - 1, 0)]  # channels coming from below
            skip_chs = self._skip_channels(k, layers)
            lvl = len(chans) - 1 - k
            blk.resnets = nn.ModuleList()
            if lvl in self.attn_levels:
                blk.attentions = nn.ModuleList()
            for j in range(layers + 1):
                in_c = (prev_out if j == 0 else ch) + skip_chs[j]
                blk.resnets.append(TResnetBlock(in_c, ch, temb, groups))
                if lvl in self.attn_levels:
                    blk.attentions.append(TSpatialTransformer(ch, heads, cross_dim, groups))
            if k < len(chans) - 1:
                blk.upsamplers = nn.ModuleList([TUpsample(ch)])
            self.up_blocks.append(blk)
        self.conv_norm_out = nn.GroupNorm(groups, chans[0])
        self.conv_out = nn.Conv2d(chans[0], in_ch, 3, padding=1)

    def _skip_channels(self, k, layers):
        # recompute the skip stack exactly as the down path pushes it
        chans = self.chans
        skips = [chans[0]]
        for i, ch in enumerate(chans):
            for _ in range(layers):
                skips.append(ch)
            if i < len(chans) - 1:
                skips.append(ch)
        out = []
        # up block k pops layers+1 skips
        start = len(skips) - 1 - k * (layers + 1)
        for j in range(layers + 1):
            out.append(skips[start - j])
        return out

    def forward(self, x, t, ctx):
        temb = timestep_embedding_torch(t, self.chans[0])
        temb = self.time_embedding.linear_2(F.silu(self.time_embedding.linear_1(temb)))
        h = self.conv_in(x)
        skips = [h]
        for blk in self.down_blocks:
            for j, r in enumerate(blk.resnets):
                h = r(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        for blk in self.up_blocks:
            for j, r in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = r(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))
