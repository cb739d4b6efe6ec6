"""Restormer baseline (Zamir et al., CVPR 2022) — NHWC flax.

Behavioural re-implementation of the reference's copy
(/root/reference/exploration/model_multiscale_mixture_GLR/lib/
baselineRestormer.py): MDTA transposed channel attention, GDFN gated
feed-forward, bias-free/with-bias LayerNorm over channels, PixelShuffle
resamplers, 4-level U-Net with global input skip. The reference trains it
at dim 48, blocks [4,6,6,8], heads [1,2,4,8], ffn 2.66, BiasFree
(scripts/run_REstormer_sigma25.py:118-129).

TPU note: MDTA's attention is C×C over HW-length vectors — a pair of
(c, hw)·(hw, c) matmuls per head that map straight onto the MXU with the
channel dim on lanes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from irdu_tpu.models.layers import Conv3x3Zero, GroupedPointwise, pixel_shuffle, pixel_unshuffle
from irdu_tpu.models.restormer_blocks import gelu_exact


class RestormerLayerNorm(nn.Module):
    """Channel LayerNorm, biased variance (torch var(unbiased=False)),
    'BiasFree' (scale only) or 'WithBias' (mean-subtract, scale+bias)."""

    dim: int
    norm_type: str = "WithBias"

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        if self.norm_type == "BiasFree":
            var = jnp.mean(jnp.square(x - jnp.mean(x, axis=-1, keepdims=True)),
                           axis=-1, keepdims=True)
            return x / jnp.sqrt(var + 1e-5) * weight
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-5) * weight + bias


class MDTA(nn.Module):
    """Multi-DConv-head transposed attention: attention over the CHANNEL
    dimension (C×C per head), queries/keys L2-normalized over HW."""

    dim: int
    num_heads: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        temperature = self.param(
            "temperature", nn.initializers.ones, (self.num_heads, 1, 1))
        qkv = GroupedPointwise(features=c * 3, use_bias=self.use_bias, name="qkv")(x)
        qkv = Conv3x3Zero(features=c * 3, groups=c * 3, use_bias=self.use_bias,
                          name="qkv_dwconv")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # (B,H,W,C) -> (B, heads, C/heads, HW)
            t = t.reshape(b, h * w, self.num_heads, c // self.num_heads)
            return t.transpose(0, 2, 3, 1)

        q, k, v = heads(q), heads(k), heads(v)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        attn = jnp.einsum("bhcn,bhdn->bhcd", q, k,
                          preferred_element_type=jnp.float32) * temperature
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, v,
                         preferred_element_type=jnp.float32)
        # attention accumulates in f32; return to the residual stream's
        # dtype so the bf16 inference path stays bf16 end-to-end (strict
        # conv dtypes downstream)
        out = out.astype(x.dtype)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
        return GroupedPointwise(features=c, use_bias=self.use_bias,
                                name="project_out")(out)


class RestormerFeedForward(nn.Module):
    dim: int
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.ffn_expansion_factor)
        x = GroupedPointwise(features=hidden * 2, use_bias=self.use_bias,
                             name="project_in")(x)
        x = Conv3x3Zero(features=hidden * 2, groups=hidden * 2,
                        use_bias=self.use_bias, name="dwconv")(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        return GroupedPointwise(features=self.dim, use_bias=self.use_bias,
                                name="project_out")(gelu_exact(x1) * x2)


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    norm_type: str = "WithBias"

    @nn.compact
    def __call__(self, x):
        x = x + MDTA(self.dim, self.num_heads, self.use_bias, name="attn")(
            RestormerLayerNorm(self.dim, self.norm_type, name="norm1")(x))
        x = x + RestormerFeedForward(self.dim, self.ffn_expansion_factor,
                                     self.use_bias, name="ffn")(
            RestormerLayerNorm(self.dim, self.norm_type, name="norm2")(x))
        return x


class Restormer(nn.Module):
    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    norm_type: str = "WithBias"
    dual_pixel_task: bool = False
    # training-memory knob: rematerialize per transformer block — the
    # 26M-param model's backward exceeds 16 GB HBM at 256²·b2+ stages
    # without it (same knob as the flagship family). Param names are
    # unchanged (nn.remat preserves module naming), so weight bridges and
    # snapshots are remat-agnostic.
    remat: bool = False

    @nn.compact
    def __call__(self, inp_img):
        d = self.dim
        Block = nn.remat(TransformerBlock) if self.remat else TransformerBlock

        def blocks(x, dim, heads, n, scope):
            for i in range(n):
                x = Block(dim, heads, self.ffn_expansion_factor,
                          self.use_bias, self.norm_type,
                          name=f"{scope}_{i}")(x)
            return x

        def down(x, n_feat, scope):
            x = Conv3x3Zero(features=n_feat // 2, name=f"{scope}_conv")(x)
            return pixel_unshuffle(x, 2)

        def up(x, n_feat, scope):
            x = Conv3x3Zero(features=n_feat * 2, name=f"{scope}_conv")(x)
            return pixel_shuffle(x, 2)

        x = Conv3x3Zero(features=d, use_bias=self.use_bias, name="patch_embed")(inp_img)
        enc1_in = x
        enc1 = blocks(x, d, self.heads[0], self.num_blocks[0], "encoder_level1")
        x = down(enc1, d, "down1_2")
        enc2 = blocks(x, d * 2, self.heads[1], self.num_blocks[1], "encoder_level2")
        x = down(enc2, d * 2, "down2_3")
        enc3 = blocks(x, d * 4, self.heads[2], self.num_blocks[2], "encoder_level3")
        x = down(enc3, d * 4, "down3_4")
        x = blocks(x, d * 8, self.heads[3], self.num_blocks[3], "latent")

        x = up(x, d * 8, "up4_3")
        x = jnp.concatenate([x, enc3], axis=-1)
        x = GroupedPointwise(features=d * 4, use_bias=self.use_bias,
                             name="reduce_chan_level3")(x)
        x = blocks(x, d * 4, self.heads[2], self.num_blocks[2], "decoder_level3")

        x = up(x, d * 4, "up3_2")
        x = jnp.concatenate([x, enc2], axis=-1)
        x = GroupedPointwise(features=d * 2, use_bias=self.use_bias,
                             name="reduce_chan_level2")(x)
        x = blocks(x, d * 2, self.heads[1], self.num_blocks[1], "decoder_level2")

        x = up(x, d * 2, "up2_1")
        x = jnp.concatenate([x, enc1], axis=-1)
        x = blocks(x, d * 2, self.heads[0], self.num_blocks[0], "decoder_level1")
        x = blocks(x, d * 2, self.heads[0], self.num_refinement_blocks, "refinement")

        if self.dual_pixel_task:
            x = x + GroupedPointwise(features=d * 2, use_bias=self.use_bias,
                                     name="skip_conv")(enc1_in)
            return Conv3x3Zero(features=self.out_channels, use_bias=self.use_bias,
                               name="output")(x)
        return Conv3x3Zero(features=self.out_channels, use_bias=self.use_bias,
                           name="output")(x) + inp_img
