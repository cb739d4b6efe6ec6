"""Shared layer utilities for the model zoo.

TPU-first choices:
  * NHWC everywhere; channels ride the 128-wide lane dimension.
  * 2×2 stride-2 (transpose-)convs are expressed as space-to-depth /
    depth-to-space + a dense matmul — MXU work instead of tiny convs.
  * 3×3 convs go through lax.conv_general_dilated after an explicit
    replicate pad (the reference uses padding_mode="replicate").
  * Initializers reproduce torch.nn.Conv2d's default kaiming-uniform
    (bound = 1/√fan_in) so training dynamics match the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def spectral_normalize(module: nn.Module, kernel: jnp.ndarray, name: str) -> jnp.ndarray:
    """Spectral normalisation of a conv kernel (the v21 variant: every
    encoder/decoder conv wrapped in torch spectral_norm,
    model_GLR_GTV_deep_v21.py:941-1124). Output features are the LAST axis
    of our kernels; the matricization is (O, everything-else), whose top
    singular value σ is estimated by one power iteration on a persistent
    u vector (collection "spectral"); the kernel is used as W/σ."""
    o = kernel.shape[-1]
    mat = jnp.moveaxis(kernel, -1, 0).reshape(o, -1)
    u_var = module.variable(
        "spectral", f"{name}_u",
        lambda: jax.random.normal(jax.random.PRNGKey(0), (o,)) / np.sqrt(o),
    )
    u = u_var.value
    v = mat.T @ u
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
    wv = mat @ v
    sigma = jnp.maximum(jnp.vdot(u, wv), 1e-12)
    if not module.is_initializing() and module.is_mutable_collection("spectral"):
        u_var.value = wv / jnp.maximum(jnp.linalg.norm(wv), 1e-12)
    return kernel / sigma


def non_expansive_scale(module: nn.Module, x_ones_out: jnp.ndarray,
                        features: int, scaling_init: float = 1.0) -> jnp.ndarray:
    """The v20 CustomNonExpansiveCNN gain bound
    (model_GLR_GTV_deep_v20.py:911-933): scale = tanh(1/(|W|∗1 · s + 1e-16))
    where |W|∗1 is the same conv applied with |kernel| to a ones input
    (passed in as x_ones_out); s is a learned per-output-channel factor."""
    s = module.param("scaling_factor", lambda key, shape: jnp.ones(shape), (features,))
    return jnp.tanh(1.0 / (x_ones_out * s + 1e-16))


def torch_conv_init(fan_in: int):
    """torch Conv2d default: kaiming_uniform(a=√5) ⇒ U(−1/√fan_in, 1/√fan_in),
    fan_in = (in_channels/groups)·kh·kw."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/2, W/2, 4C), block order (a, b, c): the flat
    channel index is (a·2+b)·C + c for spatial offset (a, b)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 4C) → (B, 2H, 2W, C), inverse block order of space_to_depth."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def replicate_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")


def conv2d_nhwc(x: jnp.ndarray, kernel: jnp.ndarray, *, stride: int = 1,
                groups: int = 1) -> jnp.ndarray:
    """VALID conv, NHWC input, HWIO kernel."""
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


class GroupedPointwise(nn.Module):
    """1×1 conv with channel groups (torch Conv2d kernel_size=1, groups=g,
    bias=False), as a blocked einsum — a batched matmul on the MXU.

    variant: "plain" | "spectral_norm" (v21) | "non_expansive" (v20)."""

    features: int
    groups: int = 1
    use_bias: bool = False
    variant: str = "plain"

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        g = self.groups
        kernel = self.param(
            "kernel", torch_conv_init(c_in // g), (c_in, self.features // g)
        )
        if self.variant == "spectral_norm":
            kernel = spectral_normalize(self, kernel, "kernel")

        def apply_kernel(inp, kern):
            if g == 1:
                return jnp.einsum("...i,io->...o", inp, kern)
            xg = inp.reshape(*inp.shape[:-1], g, c_in // g)
            kg = kern.reshape(g, c_in // g, self.features // g)
            y = jnp.einsum("...gi,gio->...go", xg, kg)
            return y.reshape(*inp.shape[:-1], self.features)

        y = apply_kernel(x, kernel)
        if self.use_bias:
            bias = self.param("bias", torch_conv_init(c_in // g), (self.features,))
            y = y + bias
        if self.variant == "non_expansive":
            norm = apply_kernel(jnp.ones_like(x), jnp.abs(kernel))
            y = y * non_expansive_scale(self, norm, self.features)
        return y


class Conv3x3Replicate(nn.Module):
    """3×3 stride-1 conv with replicate padding (torch padding_mode="replicate").

    variant: "plain" | "spectral_norm" (v21) | "non_expansive" (v20; the
    |W|∗1 norm map is spatially constant under replicate padding)."""

    features: int
    groups: int = 1
    use_bias: bool = False
    variant: str = "plain"

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        fan_in = (c_in // self.groups) * 9
        kernel = self.param(
            "kernel", torch_conv_init(fan_in),
            (3, 3, c_in // self.groups, self.features),
        )
        if self.variant == "spectral_norm":
            kernel = spectral_normalize(self, kernel, "kernel")
        y = conv2d_nhwc(replicate_pad(x, 1), kernel, groups=self.groups)
        if self.use_bias:
            bias = self.param("bias", torch_conv_init(fan_in), (self.features,))
            y = y + bias
        if self.variant == "non_expansive":
            # replicate-padded ones are ones: the norm map is Σ|W| per
            # output channel, constant over space
            norm = jnp.sum(jnp.abs(kernel), axis=(0, 1))  # (I/g, F)
            if self.groups == 1:
                norm = jnp.sum(norm, axis=0)
            else:
                norm = jnp.sum(norm, axis=0)  # depthwise: I/g = 1 anyway
            y = y * non_expansive_scale(self, norm, self.features)
        return y


class Downsample2x2(nn.Module):
    """Learned 2×2 stride-2 conv (torch Downsampling, reference v1x0.py:1010-1016),
    as space-to-depth + grouped matmul.

    torch weight w[oc, ic, a, b] maps to our kernel[(a·2+b)·(C/g)+ic, oc]
    (per group)."""

    features: int
    groups: int = 1
    variant: str = "plain"

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        g = self.groups
        fan_in = (c_in // g) * 4
        kernel = self.param("kernel", torch_conv_init(fan_in), (4 * c_in, self.features // g))
        if self.variant == "spectral_norm":
            kernel = spectral_normalize(self, kernel, "kernel")
        xs = space_to_depth(x)  # (B, h, w, 4*c_in) block order (a,b,c)
        if g == 1:
            y = jnp.einsum("...i,io->...o", xs, kernel)
            if self.variant == "non_expansive":
                norm = jnp.sum(jnp.abs(kernel), axis=0)
                y = y * non_expansive_scale(self, norm, self.features)
            return y
        # group structure: channel c of x belongs to group c // (c_in/g);
        # after s2d the layout is (a,b,c) so regroup explicitly.
        b, h, w, _ = xs.shape
        xs = xs.reshape(b, h, w, 4, g, c_in // g).transpose(0, 1, 2, 4, 3, 5)
        xs = xs.reshape(b, h, w, g, 4 * (c_in // g))
        kg = kernel.reshape(4, g, c_in // g, self.features // g)
        kg = kg.transpose(1, 0, 2, 3).reshape(g, 4 * (c_in // g), self.features // g)
        y = jnp.einsum("bhwgi,gio->bhwgo", xs, kg)
        return y.reshape(b, h, w, self.features)


class Upsample2x2(nn.Module):
    """Learned 2×2 stride-2 transpose conv (torch Upsampling, reference
    v1x0.py:1018-1024), as grouped matmul + depth-to-space.

    torch weight w[ic, oc, a, b] maps to kernel[ic, (a·2+b)·(F/g)+oc]."""

    features: int
    groups: int = 1
    variant: str = "plain"

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        g = self.groups
        # torch conv_transpose init fan_in uses the *output* side: O/g·kh·kw
        fan_in = (self.features // g) * 4
        kernel = self.param("kernel", torch_conv_init(fan_in), (c_in, 4 * self.features // g))
        if self.variant == "spectral_norm":
            kernel = spectral_normalize(self, kernel, "kernel")
        if g == 1:
            y = jnp.einsum("...i,io->...o", x, kernel)  # (B,h,w,4F) order (a,b,oc)
            y = depth_to_space(y)
            if self.variant == "non_expansive":
                # per-phase |W| column sums, upsampled to the output grid
                norm = jnp.sum(jnp.abs(kernel), axis=0).reshape(1, 1, 1, -1)
                norm = depth_to_space(jnp.broadcast_to(norm, (x.shape[0], x.shape[1], x.shape[2], norm.shape[-1])))
                y = y * non_expansive_scale(self, norm, self.features)
            return y
        b, h, w, _ = x.shape
        xg = x.reshape(b, h, w, g, c_in // g)
        kg = kernel.reshape(g, c_in // g, 4 * self.features // g)
        y = jnp.einsum("bhwgi,gio->bhwgo", xg, kg)  # (..., g, 4*F/g) order (a,b,oc)
        y = y.reshape(b, h, w, g, 4, self.features // g).transpose(0, 1, 2, 4, 3, 5)
        y = y.reshape(b, h, w, 4 * self.features)
        return depth_to_space(y)


def pixel_unshuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """torch nn.PixelUnshuffle channel order: (B, H·r, W·r, C) →
    (B, H, W, C·r²) with out channel index c·r² + a·r + b (channel-major,
    unlike space_to_depth's block-major order)."""
    b, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B,h,w,C,a,b)
    return x.reshape(b, h, w, c * r * r)


def pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """torch nn.PixelShuffle: (B, H, W, C·r²) → (B, H·r, W·r, C), input
    channel c·r² + a·r + b lands at spatial offset (a, b)."""
    b, h, w, cr2 = x.shape
    c = cr2 // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B,h,a,w,b,C)
    return x.reshape(b, h * r, w * r, c)


class Conv3x3Zero(nn.Module):
    """3×3 stride-1 conv with zero padding (torch Conv2d padding=1 default),
    used by the Restormer-style feature extractor and baselines."""

    features: int
    groups: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        fan_in = (c_in // self.groups) * 9
        kernel = self.param(
            "kernel", torch_conv_init(fan_in),
            (3, 3, c_in // self.groups, self.features),
        )
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            bias = self.param("bias", torch_conv_init(fan_in), (self.features,))
            y = y + bias
        return y


def box_down2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Fixed 2×2 box-mean downsample (the solver's scaling_kernel01, reference
    v1x0.py:613: depthwise 2×2 stride-2 conv with weight 0.25). Works on
    (B, H, W, ...) with spatial axes 1, 2."""
    b, h, w = x.shape[:3]
    rest = x.shape[3:]
    x = x.reshape(b, h // 2, 2, w // 2, 2, *rest)
    return (x[:, :, 0, :, 0] + x[:, :, 0, :, 1] + x[:, :, 1, :, 0] + x[:, :, 1, :, 1]) * 0.25


def box_up2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of box_down2x2 (conv_transpose with the 0.25 kernel): nearest
    upsample scaled by 0.25."""
    b, h, w = x.shape[:3]
    rest = x.shape[3:]
    y = x[:, :, None, :, None] * 0.25
    y = jnp.broadcast_to(y, (b, h, 2, w, 2, *rest))
    return y.reshape(b, 2 * h, 2 * w, *rest)
