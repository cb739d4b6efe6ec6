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
    variance (torch ``var(correction=1)``) and no mean subtraction.

    conv_variant: "plain" | "spectral_norm" (v21: the depthwise scale is
    spectral-normed, i.e. divided by its L2 norm) | "non_expansive" (v20:
    scale gain-bounded by tanh(1/(|w|·s)))."""

    nchannels: int
    nsubnets: int = 1
    conv_variant: str = "plain"

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
        if self.conv_variant == "spectral_norm":
            scale = scale / jnp.maximum(jnp.linalg.norm(scale), 1e-12)
        y = x * scale
        if self.conv_variant == "non_expansive":
            from irdu_tpu.models.layers import non_expansive_scale

            y = y * non_expansive_scale(self, jnp.abs(scale), c)
        return y


class LocalGatedLinearBlock(nn.Module):
    """1×1 expand → 3×3 depthwise (replicate pad) → gate σ(m)·m·x → 1×1
    project (reference LocalGatedLinearBlock, v1x0.py:929-948)."""

    dim: int
    hidden_dim: int
    nsubnets: int = 1
    conv_variant: str = "plain"

    @nn.compact
    def __call__(self, x):
        h2 = self.hidden_dim * 2
        x = GroupedPointwise(features=h2, groups=self.nsubnets,
                             variant=self.conv_variant,
                             name="channels_linear_op")(x)
        x = Conv3x3Replicate(features=h2, groups=h2,
                             variant=self.conv_variant,
                             name="channels_local_linear_op")(x)
        mask, x = jnp.split(x, 2, axis=-1)
        x = nn.sigmoid(mask) * mask * x
        return GroupedPointwise(features=self.dim, groups=self.nsubnets,
                                variant=self.conv_variant,
                                name="project_out")(x)


class LocalNonLinearBlock(nn.Module):
    """norm → gated block with a learnable 2-way skip
    (reference LocalNonLinearBlock, v1x0.py:951-964).

    use_pallas: route inference through the fused single-HBM-pass Pallas
    kernel (ops.pallas.gated_block; ~1.8× over the XLA path on v5e).
    Params are identical either way; the jnp path remains authoritative
    (used during init, for training/autodiff, and for unsupported shapes
    or variants)."""

    dim: int
    hidden_dim: int
    nsubnets: int = 1
    conv_variant: str = "plain"
    use_pallas: bool = False

    def setup(self):
        self.skip_weight = self.param("skip_weight", _const_pair(1.0, 1.0), (2,))
        self.norm = CustomLayerNorm(self.dim, self.nsubnets,
                                    conv_variant=self.conv_variant, name="norm")
        self.local_linear = LocalGatedLinearBlock(
            self.dim, self.hidden_dim, self.nsubnets,
            conv_variant=self.conv_variant, name="local_linear")

    def gated_params(self) -> dict:
        """The block's fused-kernel operand dict (keys match
        ops.pallas.gated_block / ops.pallas.block_stack)."""
        p_norm = self.norm.variables["params"]
        p_gl = self.local_linear.variables["params"]
        return dict(
            scale=p_norm["weighted_transform"],
            w1=p_gl["channels_linear_op"]["kernel"],
            dwk=p_gl["channels_local_linear_op"]["kernel"][:, :, 0, :],
            w2=p_gl["project_out"]["kernel"],
            skip=self.skip_weight,
        )

    def __call__(self, x):
        eligible = (
            self.use_pallas
            and not self.is_initializing()
            and self.nsubnets == 1
            and self.conv_variant == "plain"
            and x.shape[1] % 8 == 0
            and x.shape[2] % 8 == 0
        )
        if eligible:
            import jax

            from irdu_tpu.ops.pallas.gated_block import fused_gated_block

            p = self.gated_params()
            return fused_gated_block(
                x, p["scale"], p["w1"], p["dwk"], p["w2"], p["skip"],
                interpret=jax.default_backend() != "tpu")
        sw = self.skip_weight
        y = self.local_linear(self.norm(x))
        return sw[0] * x + sw[1] * y


class RegionalPixelEmbedding(nn.Module):
    """3×3 replicate-pad patch embedding (reference ReginalPixelEmbeding,
    v1x0.py:992-1005)."""

    dim: int = 48
    conv_variant: str = "plain"

    @nn.compact
    def __call__(self, x):
        return Conv3x3Replicate(features=self.dim, variant=self.conv_variant,
                                name="channels_local_linear_op01")(x)


class LocalLowpassFilteringBlock(nn.Module):
    """One unrolled GGTV+GGLR solve with a learnable 0.5/0.5 skip
    (reference LocalLowpassFilteringBlock, v1x0.py:967-988).

    ``__call__(x, chw=True)`` accepts/returns (B, C, H, W) for the CHW
    fast path; if the solver can't run CHW for this shape it transposes
    around the NHWC path internally."""

    dim: int
    ngraphs: int
    nsubnets: int = 1
    window: str = "cross4"
    use_pallas_solver: bool = False
    eval_cg_iters: int = 3

    def setup(self):
        from irdu_tpu.solvers.gtv_glr import MixtureGTVGLR

        self.skip_weight = self.param("skip_weight", _const_pair(0.5, 0.5),
                                      (2,))
        self.local_filter = MixtureGTVGLR(
            n_graphs=self.ngraphs,
            n_node_fts=self.dim // self.ngraphs,
            alpha_init=0.5,
            beta_init=0.1,
            muy_init=(0.001, 0.0001),
            ro_init=(0.0001, 0.0001),
            gamma_init=(0.0001, 0.0001),
            window=self.window,
            use_pallas_unroll=self.use_pallas_solver,
            eval_cg_iters=self.eval_cg_iters,
            name="local_filter",
        )

    def __call__(self, x, chw: bool = False):
        sw = self.skip_weight
        y = self.local_filter(x, chw=chw)
        return sw[0] * x + sw[1] * y
