"""Restormer-flavoured feature-extraction blocks shared by the
pixel-domain (v1–v8) model family and the Restormer baseline.

Behavioural re-implementations of the blocks in reference
lib/model_GLR_GTV_deep_v6.py:13-272 (FFBlock U-Net used as edge-weight
CNN) — NHWC, gelu exact (torch default), PixelShuffle resamplers.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from irdu_tpu.models.layers import (
    Conv3x3Zero,
    GroupedPointwise,
    pixel_shuffle,
    pixel_unshuffle,
    torch_conv_init,
)


def gelu_exact(x):
    """torch F.gelu default (erf form); jax.nn.gelu defaults to tanh approx."""
    return jax.nn.gelu(x, approximate=False)


class ChannelVarNorm(nn.Module):
    """v6 CustomLayerNorm (model_GLR_GTV_deep_v6.py:13-25): divide by the
    unbiased variance over ALL channels (no mean subtraction), then a
    per-channel learned scale."""

    nchannels: int

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / (self.nchannels - 1)
        scale = self.param("weighted_transform", torch_conv_init(1), (self.nchannels,))
        return (x / jnp.sqrt(var + 1e-5)) * scale


class GatedDConvFeedForward(nn.Module):
    """Restormer GDFN: 1×1 expand ×2 → 3×3 depthwise → gelu(x1)·x2 → 1×1
    project (v6 FeedForward, :29-47)."""

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
        x = gelu_exact(x1) * x2
        return GroupedPointwise(features=self.dim, use_bias=self.use_bias,
                                name="project_out")(x)


class FFBlock(nn.Module):
    """norm → GDFN with learnable 0.5/0.5 skip (v6 FFBlock, :51-68)."""

    dim: int
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        sw = self.param(
            "skip_connect_weight_final",
            lambda key, shape: jnp.array([0.5, 0.5], jnp.float32), (2,),
        )
        y = ChannelVarNorm(self.dim, name="norm")(x)
        y = GatedDConvFeedForward(self.dim, self.ffn_expansion_factor,
                                  self.use_bias, name="ffn")(y)
        return sw[0] * x + sw[1] * y


class OverlapPatchEmbed(nn.Module):
    """3×3 zero-pad embed (v6 :72-83)."""

    embed_dim: int = 48
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        return Conv3x3Zero(features=self.embed_dim, use_bias=self.use_bias,
                           name="proj")(x)


class Downsample(nn.Module):
    """3×3 conv n→n/2 + PixelUnshuffle(2) ⇒ channels double, spatial halves
    (v6 :87-100)."""

    n_feat: int

    @nn.compact
    def __call__(self, x):
        x = Conv3x3Zero(features=self.n_feat // 2, name="body_conv")(x)
        return pixel_unshuffle(x, 2)


class Upsample(nn.Module):
    """3×3 conv n→2n + PixelShuffle(2) ⇒ channels halve, spatial doubles
    (v6 :102-115)."""

    n_feat: int

    @nn.compact
    def __call__(self, x):
        x = Conv3x3Zero(features=self.n_feat * 2, name="body_conv")(x)
        return pixel_shuffle(x, 2)


class FeatureExtraction(nn.Module):
    """FFBlock U-Net producing edge-weight features (+DC channels) for the
    pixel-domain mixture models (v6 FeatureExtraction, :195-272).

    Note the asymmetric decode: level-1 decode runs at 2·dim (up2_1 output
    concat with the level-1 skip, no channel reduction).

    n_levels: 3 = the v5+ truncated U-Net (v6 comments out level 4);
    4 = the v4-era full Restormer depth (model_GLR_GTV_deep_v4.py:195-273:
    down3_4 → latent FFBlocks at 8·dim → up4_3 → reduce_chan_level3 →
    decoder_level3)."""

    out_channels: int = 48
    dim: int = 48
    num_blocks: Sequence[int] = (1, 2, 2, 4)
    num_refinement_blocks: int = 4
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    n_levels: int = 3
    # training-memory knob: rematerialize each FFBlock in the backward
    # pass (same pattern as the flagship's per-LocalNonLinearBlock remat)
    # — the v6-scale pixel family exceeds 16 GB HBM at 256²+ patches
    # without it.
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        d = self.dim
        ff = self.ffn_expansion_factor
        Block = nn.remat(FFBlock) if self.remat else FFBlock
        x = OverlapPatchEmbed(d, name="patch_embed")(x)
        for i in range(self.num_blocks[0]):
            x = Block(d, ff, name=f"encoder_level1_{i}")(x)
        enc1 = x
        x = Downsample(d, name="down1_2")(x)
        for i in range(self.num_blocks[1]):
            x = Block(d * 2, ff, name=f"encoder_level2_{i}")(x)
        enc2 = x
        x = Downsample(d * 2, name="down2_3")(x)
        for i in range(self.num_blocks[2]):
            x = Block(d * 4, ff, name=f"encoder_level3_{i}")(x)

        if self.n_levels == 4:  # v4 full depth
            enc3 = x
            x = Downsample(d * 4, name="down3_4")(x)
            for i in range(self.num_blocks[3]):
                x = Block(d * 8, ff, name=f"latent_{i}")(x)
            x = Upsample(d * 8, name="up4_3")(x)
            x = jnp.concatenate([x, enc3], axis=-1)
            x = GroupedPointwise(features=d * 4, name="reduce_chan_level3")(x)
            for i in range(self.num_blocks[2]):
                x = Block(d * 4, ff, name=f"decoder_level3_{i}")(x)

        x = Upsample(d * 4, name="up3_2")(x)
        x = jnp.concatenate([x, enc2], axis=-1)
        x = GroupedPointwise(features=d * 2, name="reduce_chan_level2")(x)
        for i in range(self.num_blocks[1]):
            x = Block(d * 2, ff, name=f"decoder_level2_{i}")(x)

        x = Upsample(d * 2, name="up2_1")(x)
        x = jnp.concatenate([x, enc1], axis=-1)
        for i in range(self.num_blocks[0]):
            x = Block(d * 2, ff, name=f"decoder_level1_{i}")(x)
        for i in range(self.num_refinement_blocks):
            x = Block(d * 2, ff, name=f"refinement_{i}")(x)
        return Conv3x3Zero(features=self.out_channels, name="output")(x)


class GatedDConvBlock(nn.Module):
    """The DCestimator / SharpeningBlock shape: 1×1 → dw3×3 → gelu gate →
    1×1 (v6 DCestimator :785-800)."""

    dim_out: int
    hidden_features: int

    @nn.compact
    def __call__(self, x):
        x = GroupedPointwise(features=self.hidden_features * 2, name="project_in")(x)
        x = Conv3x3Zero(features=self.hidden_features * 2,
                        groups=self.hidden_features * 2, name="dwconv")(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = gelu_exact(x1) * x2
        return GroupedPointwise(features=self.dim_out, name="project_out")(x)
