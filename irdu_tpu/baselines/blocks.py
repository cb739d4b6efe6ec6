"""Block library for the DRUNet-family baselines — NHWC flax.

Behavioural re-implementations of the reference's comparison-model block
zoo (/root/reference/exploration/model_multiscale_mixture_GLR/lib/
baselineDRUnet/basicblock.py): the conv+norm+act builder semantics
(basicblock.py:61-98), PixelUnShuffle (:104-149), ResBlock (:211-223),
IMDBlock (:230-265), CALayer/RCABlock/RCAGroup (:275-328),
ResidualDenseBlock_5C/RRDB (:335-370), the strideconv/maxpool/avgpool
downsamplers and convtranspose/upconv/pixelshuffle upsamplers
(:388-469), and the embedded-Gaussian NonLocalBlock2D (:485-533).

TPU-first notes: everything is NHWC with lax convs (MXU); the non-local
attention is two einsum matmuls over flattened pixels (MXU) instead of
torch's permute/matmul dance; pixel (un)shuffle are pure reshapes with
the torch channel order (c·r² + i·r + j, c slowest) so converted torch
weights stay valid.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from irdu_tpu.models.layers import torch_conv_init


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B,H,W,C) → (B,H/r,W/r,C·r²), channel order c·r²+i·r+j
    (reference basicblock.py:104-126)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // r, w // r, c * r * r)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B,H,W,C·r²) → (B,H·r,W·r,C), inverse channel order (torch
    nn.PixelShuffle semantics)."""
    b, h, w, cr2 = x.shape
    c = cr2 // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


def _apply_act(y: jnp.ndarray, act: str, neg_slope: float) -> jnp.ndarray:
    if act == "relu":
        return nn.relu(y)
    if act == "leaky":
        return jnp.where(y >= 0, y, neg_slope * y)
    if act == "sigmoid":
        return jax.nn.sigmoid(y)
    assert act == "none", act
    return y


class ConvAct(nn.Module):
    """conv (+ BatchNorm) (+ activation) — the basicblock ``conv(mode=
    'C[B][R|L]')`` builder as one module. torch-default kaiming-uniform
    init; BN matches torch momentum 0.9 / eps 1e-4 (basicblock.py:69)."""

    features: int
    ksize: int = 3
    use_bias: bool = True
    act: str = "relu"  # "relu" | "leaky" | "sigmoid" | "none"
    neg_slope: float = 0.2
    dilation: int = 1
    stride: int = 1
    padding: Optional[int] = None  # default: 'same' for the dilated ksize
    use_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        k = self.ksize
        fan_in = c_in * k * k
        kernel = self.param("kernel", torch_conv_init(fan_in),
                            (k, k, c_in, self.features))
        pad = self.dilation * (k // 2) if self.padding is None else self.padding
        y = jax.lax.conv_general_dilated(
            x, kernel, (self.stride, self.stride), ((pad, pad), (pad, pad)),
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", torch_conv_init(fan_in), (self.features,))
        if self.use_bn:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-4, name="bn")(y)
        return _apply_act(y, self.act, self.neg_slope)


class ConvTransposeAct(nn.Module):
    """k×k stride-k transposed conv (+ BN) (+ act) — the basicblock
    ``upsample_convtranspose`` builder (basicblock.py:413-419). torch
    conv_transpose2d convolves while lax.conv_transpose correlates, so
    the spatial taps are flipped; weights convert as (in,out,kh,kw) →
    HWOI."""

    features: int
    ksize: int = 2
    use_bias: bool = True
    act: str = "none"
    neg_slope: float = 0.2
    use_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        k = self.ksize
        fan_in = self.features * k * k  # torch fan-in for transposed convs
        kernel = self.param("kernel", torch_conv_init(fan_in),
                            (k, k, self.features, c_in))
        y = jax.lax.conv_transpose(
            x, kernel[::-1, ::-1], (k, k), "VALID",
            dimension_numbers=("NHWC", "HWOI", "NHWC"))
        if self.use_bias:
            y = y + self.param("bias", torch_conv_init(fan_in), (self.features,))
        if self.use_bn:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-4, name="bn")(y)
        return _apply_act(y, self.act, self.neg_slope)


class Downsample(nn.Module):
    """2× downsampler: 'strideconv' (2×2 stride-2 conv, basicblock.py:437),
    'maxpool'/'avgpool' (k2s2 pool then 3×3 conv; the maxpool tail uses
    padding 0 — a reference quirk kept, basicblock.py:449-469). Optional
    trailing activation ('2R' modes)."""

    features: int
    mode: str = "strideconv"
    use_bias: bool = True
    act: str = "none"
    use_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.mode == "strideconv":
            return ConvAct(self.features, ksize=2, stride=2, padding=0,
                           use_bias=self.use_bias, act=self.act,
                           use_bn=self.use_bn, name="conv")(x, train)
        reducer = jnp.max if self.mode == "maxpool" else jnp.mean
        b, h, w, c = x.shape
        pooled = reducer(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))
        pad = 0 if self.mode == "maxpool" else 1  # reference asymmetry
        return ConvAct(self.features, ksize=3, padding=pad,
                       use_bias=self.use_bias, act=self.act,
                       use_bn=self.use_bn, name="conv")(pooled, train)


class Upsample(nn.Module):
    """2× upsampler: 'convtranspose' (default), 'upconv' (nearest 2× then
    3×3 conv, basicblock.py:397-407), 'pixelshuffle' (3×3 conv to 4C then
    shuffle, :388-391)."""

    features: int
    mode: str = "convtranspose"
    use_bias: bool = True
    act: str = "none"
    use_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.mode == "convtranspose":
            return ConvTransposeAct(self.features, use_bias=self.use_bias,
                                    act=self.act, use_bn=self.use_bn,
                                    name="conv")(x, train)
        if self.mode == "upconv":
            up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            return ConvAct(self.features, use_bias=self.use_bias, act=self.act,
                           use_bn=self.use_bn, name="conv")(up, train)
        assert self.mode == "pixelshuffle", self.mode
        y = ConvAct(self.features * 4, use_bias=self.use_bias, act="none",
                    name="conv")(x, train)
        y = pixel_shuffle(y, 2)
        return _apply_act(y, self.act, 0.2)


class IMDBlock(nn.Module):
    """Information multi-distillation block (basicblock.py:230-265):
    three distill/refine conv splits + a 1×1 fuse, residual add. The
    reference's IMDB convs default to leaky-ReLU slope 0.05."""

    features: int
    d_rate: float = 0.25
    use_bias: bool = True
    act: str = "leaky"
    neg_slope: float = 0.05

    @nn.compact
    def __call__(self, x, train: bool = False):
        d_nc = int(self.features * self.d_rate)
        kw = dict(use_bias=self.use_bias, act=self.act,
                  neg_slope=self.neg_slope)
        d1, r = jnp.split(ConvAct(self.features, name="conv1", **kw)(x, train),
                          [d_nc], axis=-1)
        d2, r = jnp.split(ConvAct(self.features, name="conv2", **kw)(r, train),
                          [d_nc], axis=-1)
        d3, r = jnp.split(ConvAct(self.features, name="conv3", **kw)(r, train),
                          [d_nc], axis=-1)
        r = ConvAct(d_nc, use_bias=self.use_bias, act="none",
                    name="conv4")(r, train)
        res = ConvAct(self.features, ksize=1, use_bias=self.use_bias,
                      act="none", name="conv1x1")(
            jnp.concatenate([d1, d2, d3, r], axis=-1), train)
        return x + res


class CALayer(nn.Module):
    """Channel attention: global-avg-pool → 1×1 squeeze/excite → sigmoid
    gate (basicblock.py:275-290)."""

    features: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = ConvAct(self.features // self.reduction, ksize=1, act="relu",
                    name="fc1")(y)
        y = ConvAct(self.features, ksize=1, act="sigmoid", name="fc2")(y)
        return x * y


class RCABlock(nn.Module):
    """Residual channel-attention block: conv-relu-conv → CA → +x
    (basicblock.py:296-309)."""

    features: int
    reduction: int = 16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvAct(self.features, use_bias=self.use_bias, act="relu",
                    name="conv1")(x, train)
        y = ConvAct(self.features, use_bias=self.use_bias, act="none",
                    name="conv2")(y, train)
        return CALayer(self.features, self.reduction, name="ca")(y) + x


class RCAGroup(nn.Module):
    """nb RCABlocks + trailing conv, residual around the group
    (basicblock.py:315-328)."""

    features: int
    reduction: int = 16
    nb: int = 12
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x
        for i in range(self.nb):
            y = RCABlock(self.features, self.reduction, self.use_bias,
                         name=f"rcab{i}")(y, train)
        y = ConvAct(self.features, act="none", name="conv")(y, train)
        return y + x


class ResidualDenseBlock5C(nn.Module):
    """5-conv residual dense block, growth gc, 0.2-scaled residual
    (basicblock.py:335-351)."""

    features: int
    gc: int = 32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(use_bias=self.use_bias, act="relu")
        x1 = ConvAct(self.gc, name="conv1", **kw)(x, train)
        x2 = ConvAct(self.gc, name="conv2", **kw)(
            jnp.concatenate([x, x1], -1), train)
        x3 = ConvAct(self.gc, name="conv3", **kw)(
            jnp.concatenate([x, x1, x2], -1), train)
        x4 = ConvAct(self.gc, name="conv4", **kw)(
            jnp.concatenate([x, x1, x2, x3], -1), train)
        x5 = ConvAct(self.features, use_bias=self.use_bias, act="none",
                     name="conv5")(jnp.concatenate([x, x1, x2, x3, x4], -1),
                                   train)
        return x5 * 0.2 + x


class RRDB(nn.Module):
    """Residual-in-residual dense block: 3 RDBs, 0.2-scaled outer residual
    (basicblock.py:358-370)."""

    features: int
    gc: int = 32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ResidualDenseBlock5C(self.features, self.gc, self.use_bias,
                                 name="rdb1")(x, train)
        y = ResidualDenseBlock5C(self.features, self.gc, self.use_bias,
                                 name="rdb2")(y, train)
        y = ResidualDenseBlock5C(self.features, self.gc, self.use_bias,
                                 name="rdb3")(y, train)
        return y * 0.2 + x


class NonLocalBlock2D(nn.Module):
    """Embedded-Gaussian non-local attention over all pixels
    (basicblock.py:485-533): 1×1 θ/φ/g projections to C/2, softmax(θφᵀ)g,
    1×1+BN output projection W, residual add. On TPU the two pixel-matmuls
    ride the MXU as batched einsums; optional 2× strideconv downsample of
    φ/g (the reference's usage keeps downsample=False)."""

    features: int
    use_bias: bool = True
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        inter = self.features // 2
        theta = ConvAct(inter, ksize=1, use_bias=self.use_bias, act="none",
                        name="theta")(x, train).reshape(b, h * w, inter)
        if self.downsample:
            phi_g_conv = dict(ksize=2, stride=2, padding=0)
        else:
            phi_g_conv = dict(ksize=1)
        phi = ConvAct(inter, use_bias=self.use_bias, act="none", name="phi",
                      **phi_g_conv)(x, train).reshape(b, -1, inter)
        g = ConvAct(inter, use_bias=self.use_bias, act="none", name="g",
                    **phi_g_conv)(x, train).reshape(b, -1, inter)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", theta, phi), axis=-1)
        y = jnp.einsum("bqk,bkc->bqc", attn, g).reshape(b, h, w, inter)
        y = ConvAct(self.features, ksize=1, use_bias=self.use_bias,
                    act="none", use_bn=True, name="w")(y, train)
        return y + x
