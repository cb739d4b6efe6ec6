"""Encoder/decoder blocks of the flagship LGU model.

Behavioural re-implementations of the blocks at reference
/root/reference/exploration/GGTV_GGLR_v1.0/deep_multiscale_GGLR_GGTV_v1x0.py:911-1025,
NHWC and fusion-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from irdu_tpu.models.layers import (
    Conv3x3Replicate,
    GroupedPointwise,
    torch_conv_init,
)


def _const_pair(v0: float, v1: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.array([v0, v1], dtype)

    return init


class CustomLayerNorm(nn.Module):
    """Per-subnet variance normalisation + learned per-channel scale
    (reference CustomLayerNorm, v1x0.py:911-925). Uses the *unbiased*
    variance (torch ``var(correction=1)``) and no mean subtraction."""

    nchannels: int
    nsubnets: int = 1

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        g = self.nsubnets
        xg = x.reshape(b, h, w, g, c // g)
        mean = jnp.mean(xg, axis=-1, keepdims=True)
        # unbiased variance, matching torch var(correction=1)
        var = jnp.sum((xg - mean) ** 2, axis=-1, keepdims=True) / (c // g - 1)
        xg = xg / jnp.sqrt(var + 1e-5)
        x = xg.reshape(b, h, w, c)
        scale = self.param("weighted_transform", torch_conv_init(1), (c,))
        return x * scale


class LocalGatedLinearBlock(nn.Module):
    """1×1 expand → 3×3 depthwise (replicate pad) → gate σ(m)·m·x → 1×1
    project (reference LocalGatedLinearBlock, v1x0.py:929-948)."""

    dim: int
    hidden_dim: int
    nsubnets: int = 1

    @nn.compact
    def __call__(self, x):
        h2 = self.hidden_dim * 2
        x = GroupedPointwise(features=h2, groups=self.nsubnets,
                             name="channels_linear_op")(x)
        x = Conv3x3Replicate(features=h2, groups=h2,
                             name="channels_local_linear_op")(x)
        mask, x = jnp.split(x, 2, axis=-1)
        x = nn.sigmoid(mask) * mask * x
        return GroupedPointwise(features=self.dim, groups=self.nsubnets,
                                name="project_out")(x)


class LocalNonLinearBlock(nn.Module):
    """norm → gated block with a learnable 2-way skip
    (reference LocalNonLinearBlock, v1x0.py:951-964)."""

    dim: int
    hidden_dim: int
    nsubnets: int = 1

    @nn.compact
    def __call__(self, x):
        sw = self.param("skip_weight", _const_pair(1.0, 1.0), (2,))
        y = CustomLayerNorm(self.dim, self.nsubnets, name="norm")(x)
        y = LocalGatedLinearBlock(self.dim, self.hidden_dim, self.nsubnets,
                                  name="local_linear")(y)
        return sw[0] * x + sw[1] * y


class RegionalPixelEmbedding(nn.Module):
    """3×3 replicate-pad patch embedding (reference ReginalPixelEmbeding,
    v1x0.py:992-1005)."""

    dim: int = 48

    @nn.compact
    def __call__(self, x):
        return Conv3x3Replicate(features=self.dim,
                                name="channels_local_linear_op01")(x)


class LocalLowpassFilteringBlock(nn.Module):
    """One unrolled GGTV+GGLR solve with a learnable 0.5/0.5 skip
    (reference LocalLowpassFilteringBlock, v1x0.py:967-988)."""

    dim: int
    ngraphs: int
    nsubnets: int = 1
    window: str = "cross4"

    @nn.compact
    def __call__(self, x):
        from irdu_tpu.solvers.gtv_glr import MixtureGTVGLR

        sw = self.param("skip_weight", _const_pair(0.5, 0.5), (2,))
        y = MixtureGTVGLR(
            n_graphs=self.ngraphs,
            n_node_fts=self.dim // self.ngraphs,
            alpha_init=0.5,
            beta_init=0.1,
            muy_init=(0.001, 0.0001),
            ro_init=(0.0001, 0.0001),
            gamma_init=(0.0001, 0.0001),
            window=self.window,
            name="local_filter",
        )(x)
        return sw[0] * x + sw[1] * y
