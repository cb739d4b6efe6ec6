"""SwinIR baseline (Liang et al., ICCVW 2021) — NHWC flax.

Behavioural re-implementation of the reference's copy
(/root/reference/exploration/model_multiscale_mixture_GLR/lib/
baselineSwinSR.py): 8×8 window attention with relative position bias,
shifted windows, RSTB residual groups, denoising head (upsampler=None,
global input skip). The config the reference evaluates: depths 6×[6],
embed 180, heads 6×[6], window 8, mlp_ratio 2
(exploration/2007-GGTV-GGLR-explore.ipynb cell 46).

TPU notes: window partition is reshape/transpose only; attention runs as
batched (64×64) matmuls on the MXU. LayerNorm eps matches torch 1e-5.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from irdu_tpu.models.layers import Conv3x3Zero


def window_partition(x, ws):
    """(B,H,W,C) -> (B·nH·nW, ws, ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)


def window_reverse(windows, ws, h, w):
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        b_, n, c = x.shape
        ws, nh = self.window_size, self.num_heads
        head_dim = c // nh
        scale = head_dim ** -0.5

        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, nh),
        )
        rpi = relative_position_index(ws).reshape(-1)

        qkv = nn.Dense(c * 3, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, nh, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        bias = rpb_table[rpi].reshape(n, n, nh).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, nh, n, n) + mask[None, :, None]
            attn = attn.reshape(-1, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x, h, w, attn_mask=None):
        ws, ss = self.window_size, self.shift_size
        b, n, c = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x.reshape(b, h, w, c)
        if ss > 0:
            x = jnp.roll(x, (-ss, -ss), axis=(1, 2))
        xw = window_partition(x, ws).reshape(-1, ws * ws, c)
        xw = WindowAttention(self.dim, ws, self.num_heads, name="attn")(
            xw, attn_mask if ss > 0 else None)
        x = window_reverse(xw.reshape(-1, ws, ws, c), ws, h, w)
        if ss > 0:
            x = jnp.roll(x, (ss, ss), axis=(1, 2))
        x = shortcut + x.reshape(b, n, c)

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        y = nn.Dense(hidden, name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + y


def make_shift_mask(h, w, ws, ss):
    """Attention mask for shifted windows (torch SwinIR calculate_mask)."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
        for wsl in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    mask_windows = window_partition(jnp.asarray(img_mask), ws).reshape(-1, ws * ws)
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return jnp.where(attn_mask != 0, -100.0, 0.0)


class RSTB(nn.Module):
    """Residual Swin Transformer block group + conv."""

    dim: int
    depth: int
    num_heads: int
    window_size: int = 8
    mlp_ratio: float = 2.0
    remat: bool = False

    @nn.compact
    def __call__(self, x, h, w, attn_mask):
        b, n, c = x.shape
        res = x
        # per-block rematerialization: like the Restormer (PERF.md round-4
        # stability note), the 36-block backward OOMs 16 GB HBM at the
        # larger progressive-patch stages without it
        block_cls = nn.remat(SwinBlock, static_argnums=(2, 3)) if self.remat \
            else SwinBlock
        for i in range(self.depth):
            ss = 0 if i % 2 == 0 else self.window_size // 2
            x = block_cls(self.dim, self.num_heads, self.window_size, ss,
                          self.mlp_ratio, name=f"block_{i}")(x, h, w, attn_mask)
        x = x.reshape(b, h, w, c)
        x = Conv3x3Zero(features=self.dim, use_bias=True, name="conv")(x)
        return x.reshape(b, n, c) + res


class SwinIR(nn.Module):
    """Denoising config (upsampler='', img_range 1.0)."""

    in_chans: int = 3
    out_chans: int = 3
    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        ws = self.window_size
        assert h % ws == 0 and w % ws == 0, "pad input to a window multiple"

        mean = jnp.asarray([0.4488, 0.4371, 0.4040]) if self.in_chans == 3 else jnp.zeros(1)
        x = x - mean
        feat = Conv3x3Zero(features=self.embed_dim, use_bias=True,
                           name="conv_first")(x)

        tokens = feat.reshape(b, h * w, self.embed_dim)
        tokens = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(tokens)
        attn_mask = make_shift_mask(h, w, ws, ws // 2)
        for li, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            tokens = RSTB(self.embed_dim, depth, heads, ws, self.mlp_ratio,
                          remat=self.remat,
                          name=f"layers_{li}")(tokens, h, w, attn_mask)
        tokens = nn.LayerNorm(epsilon=1e-5, name="norm")(tokens)
        body = tokens.reshape(b, h, w, self.embed_dim)
        body = Conv3x3Zero(features=self.embed_dim, use_bias=True,
                           name="conv_after_body")(body)
        feat = feat + body
        out = Conv3x3Zero(features=self.out_chans, use_bias=True,
                          name="conv_last")(feat)
        return out + x + mean if self.in_chans == self.out_chans else out + mean
