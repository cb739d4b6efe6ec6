"""DRUNet-family baselines (Zhang et al.) — NHWC flax.

Behavioural re-implementations of the reference's bundled comparison
models (/root/reference/exploration/model_multiscale_mixture_GLR/lib/
baselineDRUnet/): `DnCNN` (residual conv stack, network_dncnn.py:39),
`FDnCNN` (:129, no residual), `IRCNN` (:74, dilated 7-layer),
`UNet` (plain-conv U-Net + global residual, network_unet.py:13),
`UNetRes` ("DRUNet", network_unet.py:67 — 4-scale strided-conv U-Net of
bias-free ResBlocks with a global residual path), `ResUNet` (IMDB
blocks + /8 replicate-pad forward, :119), `UNetResSubP` (pixel-
(un)shuffle wrapper around a biased UNetRes, :190), `UNetPlus`
(BN-heavy conv U-Net, :246), and `NonLocalUNet` (UNet with embedded-
Gaussian non-local attention at the third scale, :302).

Shared blocks (IMDB/CA/RCA/RRDB/NonLocal/resamplers) live in
`irdu_tpu.baselines.blocks`.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from irdu_tpu.baselines.blocks import (
    ConvAct,
    Downsample,
    IMDBlock,
    NonLocalBlock2D,
    Upsample,
    pixel_shuffle,
    pixel_unshuffle,
)
from irdu_tpu.models.layers import Conv3x3Zero, torch_conv_init


class DnCNN(nn.Module):
    """Residual denoiser: x − f(x). act_mode 'R' (conv+relu) or 'BR'
    (conv+BN+relu, the reference default)."""

    in_nc: int = 1
    out_nc: int = 1
    nc: int = 64
    nb: int = 17
    act_mode: str = "BR"

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bn = "B" in self.act_mode
        y = ConvAct(self.nc, act="relu", name="head")(x, train)
        for i in range(self.nb - 2):
            y = ConvAct(self.nc, act="relu", use_bn=use_bn, name=f"body_{i}")(y, train)
        n = ConvAct(self.out_nc, act="none", name="tail")(y, train)
        return x - n


class FDnCNN(nn.Module):
    """Flexible DnCNN: direct mapping (no residual), extra noise-map
    channel in in_nc (reference network_dncnn.py:129)."""

    in_nc: int = 2
    out_nc: int = 1
    nc: int = 64
    nb: int = 20

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvAct(self.nc, act="relu", name="head")(x, train)
        for i in range(self.nb - 2):
            y = ConvAct(self.nc, act="relu", name=f"body_{i}")(y, train)
        return ConvAct(self.out_nc, act="none", name="tail")(y, train)


class IRCNN(nn.Module):
    """7-layer dilated residual CNN (dilations 1,2,3,4,3,2,1)."""

    in_nc: int = 1
    out_nc: int = 1
    nc: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        dilations = (1, 2, 3, 4, 3, 2, 1)
        y = x
        for i, d in enumerate(dilations):
            last = i == len(dilations) - 1
            y = ConvAct(self.out_nc if last else self.nc,
                        act="none" if last else "relu",
                        dilation=d, name=f"layer_{i}")(y, train)
        return x - y


class ResBlockCRC(nn.Module):
    """Conv-relu-conv residual block (basicblock ResBlock 'CRC',
    basicblock.py:211-223); bias-free by default (the DRUNet usage)."""

    nc: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        y = Conv3x3Zero(features=self.nc, use_bias=self.use_bias,
                        name="conv1")(x)
        y = nn.relu(y)
        y = Conv3x3Zero(features=self.nc, use_bias=self.use_bias,
                        name="conv2")(y)
        return x + y


class UNetRes(nn.Module):
    """DRUNet: 4-scale U-Net of ResBlocks, strided-conv down / transposed
    up, bias-free, global additive path via skip connections."""

    in_nc: int = 1
    out_nc: int = 1
    nc: Sequence[int] = (64, 128, 256, 512)
    nb: int = 4

    @nn.compact
    def __call__(self, x0, train: bool = False):
        nc = self.nc

        def res_stack(x, c, scope):
            for i in range(self.nb):
                x = ResBlockCRC(c, name=f"{scope}_res{i}")(x)
            return x

        def down(x, c_out, scope):
            c_in = x.shape[-1]
            kernel = self.param(f"{scope}_kernel", torch_conv_init(c_in * 4),
                                (2, 2, c_in, c_out))
            return jax.lax.conv_general_dilated(
                x, kernel, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def up(x, c_out, scope):
            c_in = x.shape[-1]
            kernel = self.param(f"{scope}_kernel", torch_conv_init(c_out * 4),
                                (2, 2, c_out, c_in))
            # lax.conv_transpose correlates; torch conv_transpose2d convolves
            # — flip the spatial taps for torch-equivalent semantics
            return jax.lax.conv_transpose(
                x, kernel[::-1, ::-1], (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWOI", "NHWC"))

        # reference topology (network_unet.py:104-115): m_downK = resblocks
        # then downsample; m_upK = upsample then resblocks; skip ADDS happen
        # BEFORE each up stage (x = m_up3(x + x4)) and before the tail.
        x1 = Conv3x3Zero(features=nc[0], name="head")(x0)
        x2 = down(res_stack(x1, nc[0], "down1"), nc[1], "ds1")
        x3 = down(res_stack(x2, nc[1], "down2"), nc[2], "ds2")
        x4 = down(res_stack(x3, nc[2], "down3"), nc[3], "ds3")
        x = res_stack(x4, nc[3], "body")
        x = res_stack(up(x + x4, nc[2], "us3"), nc[2], "up3")
        x = res_stack(up(x + x3, nc[1], "us2"), nc[1], "up2")
        x = res_stack(up(x + x2, nc[0], "us1"), nc[0], "up1")
        return Conv3x3Zero(features=self.out_nc, name="tail")(x + x1)


def _act_of(act_mode: str) -> str:
    return "leaky" if act_mode[-1] == "L" else "relu"


class UNet(nn.Module):
    """Plain-conv 4-scale U-Net with additive skips and a global residual
    (reference network_unet.py:13-64). act_mode 'R' (conv+relu) or 'BR'
    (conv+BN+relu); head/tail stay norm-free as in the reference."""

    in_nc: int = 1
    out_nc: int = 1
    nc: Sequence[int] = (64, 128, 256, 512)
    nb: int = 2
    act_mode: str = "R"
    downsample_mode: str = "strideconv"
    upsample_mode: str = "convtranspose"

    @nn.compact
    def __call__(self, x0, train: bool = False):
        nc, act, bn = self.nc, _act_of(self.act_mode), "B" in self.act_mode

        def convs(x, c, n, scope):
            for i in range(n):
                x = ConvAct(c, act=act, use_bn=bn,
                            name=f"{scope}_c{i}")(x, train)
            return x

        def down(x, c, scope):
            return Downsample(c, self.downsample_mode, act=act, use_bn=bn,
                              name=scope)(x, train)

        def up(x, c, scope):
            return Upsample(c, self.upsample_mode, act=act, use_bn=bn,
                            name=scope)(x, train)

        x1 = ConvAct(nc[0], act=act, name="head")(x0, train)
        x2 = down(convs(x1, nc[0], self.nb, "down1"), nc[1], "ds1")
        x3 = down(convs(x2, nc[1], self.nb, "down2"), nc[2], "ds2")
        x4 = down(convs(x3, nc[2], self.nb, "down3"), nc[3], "ds3")
        x = convs(x4, nc[3], self.nb + 1, "body")
        x = convs(up(x + x4, nc[2], "us3"), nc[2], self.nb, "up3")
        x = convs(up(x + x3, nc[1], "us2"), nc[1], self.nb, "up2")
        x = convs(up(x + x2, nc[0], "us1"), nc[0], self.nb, "up1")
        return ConvAct(self.out_nc, act="none", name="tail")(x + x1, train) + x0


class ResUNet(nn.Module):
    """IMDB-block U-Net, bias-free, with in-forward replicate padding to a
    multiple of 8 and crop (reference network_unet.py:119-175). The IMDB
    convs use leaky-ReLU slope 0.05 (basicblock IMDBlock default)."""

    in_nc: int = 1
    out_nc: int = 1
    nc: Sequence[int] = (64, 128, 256, 512)
    nb: int = 4
    act_mode: str = "L"

    @nn.compact
    def __call__(self, x, train: bool = False):
        nc, act = self.nc, _act_of(self.act_mode)
        h, w = x.shape[1:3]
        pb, pr = (-h) % 8, (-w) % 8
        x = jnp.pad(x, ((0, 0), (0, pb), (0, pr), (0, 0)), mode="edge")

        def imdbs(y, c, scope):
            for i in range(self.nb):
                y = IMDBlock(c, use_bias=False, act=act,
                             name=f"{scope}_imdb{i}")(y, train)
            return y

        def down(y, c, scope):
            return Downsample(c, use_bias=False, name=scope)(y, train)

        def up(y, c, scope):
            return Upsample(c, use_bias=False, name=scope)(y, train)

        x1 = ConvAct(nc[0], use_bias=False, act="none", name="head")(x, train)
        x2 = down(imdbs(x1, nc[0], "down1"), nc[1], "ds1")
        x3 = down(imdbs(x2, nc[1], "down2"), nc[2], "ds2")
        x4 = down(imdbs(x3, nc[2], "down3"), nc[3], "ds3")
        y = imdbs(x4, nc[3], "body")
        y = imdbs(up(y + x4, nc[2], "us3"), nc[2], "up3")
        y = imdbs(up(y + x3, nc[1], "us2"), nc[1], "up2")
        y = imdbs(up(y + x2, nc[0], "us1"), nc[0], "up1")
        y = ConvAct(self.out_nc, use_bias=False, act="none",
                    name="tail")(y + x1, train)
        return y[:, :h, :w, :]


class UNetResSubP(nn.Module):
    """UNetRes on a 2× pixel-unshuffled grid: sub-pixel down, biased
    ResBlocks, sub-pixel up + global residual (network_unet.py:190-243)."""

    in_nc: int = 1
    out_nc: int = 1
    nc: Sequence[int] = (64, 128, 256, 512)
    nb: int = 2
    act_mode: str = "R"

    @nn.compact
    def __call__(self, x0, train: bool = False):
        nc, act = self.nc, _act_of(self.act_mode)

        def res_stack(x, c, scope):
            for i in range(self.nb):
                x = ResBlockCRC(c, use_bias=True, name=f"{scope}_res{i}")(x)
            return x

        def down(x, c, scope):
            return Downsample(c, act=act, name=scope)(x, train)

        def up(x, c, scope):
            return Upsample(c, act=act, name=scope)(x, train)

        x0d = pixel_unshuffle(x0, 2)
        x1 = ConvAct(nc[0], act=act, name="head")(x0d, train)
        x2 = down(res_stack(x1, nc[0], "down1"), nc[1], "ds1")
        x3 = down(res_stack(x2, nc[1], "down2"), nc[2], "ds2")
        x4 = down(res_stack(x3, nc[2], "down3"), nc[3], "ds3")
        x = res_stack(x4, nc[3], "body")
        x = ResBlockCRC(nc[3], use_bias=True, name="body_res_extra")(x)
        x = res_stack(up(x + x4, nc[2], "us3"), nc[2], "up3")
        x = res_stack(up(x + x3, nc[1], "us2"), nc[1], "up2")
        x = res_stack(up(x + x2, nc[0], "us1"), nc[0], "up1")
        x = ConvAct(self.out_nc * 4, use_bias=False, act="none",
                    name="tail")(x + x1, train)
        return pixel_shuffle(x, 2) + x0


class UNetPlus(nn.Module):
    """Conv U-Net where each stage's LAST pre-resample activation drops the
    norm (reference network_unet.py:246-294: down resamplers use
    mode '2'+act_mode[1], up stages end with 'C'+act_mode[1]). The
    reference requires a 2-char act_mode ('BR'): with plain 'R' its
    constructor raises IndexError."""

    in_nc: int = 3
    out_nc: int = 3
    nc: Sequence[int] = (64, 128, 256, 512)
    nb: int = 1
    act_mode: str = "BR"

    @nn.compact
    def __call__(self, x0, train: bool = False):
        assert len(self.act_mode) == 2, "UNetPlus needs a 2-char act_mode"
        nc, act, bn = self.nc, _act_of(self.act_mode), "B" in self.act_mode

        def convs(x, c, n, scope, last_plain=False):
            for i in range(n):
                plain = last_plain and i == n - 1
                x = ConvAct(c, act=act, use_bn=bn and not plain,
                            name=f"{scope}_c{i}")(x, train)
            return x

        x1 = ConvAct(nc[0], act="none", name="head")(x0, train)
        x2 = Downsample(nc[1], act=act, name="ds1")(
            convs(x1, nc[0], self.nb, "down1"), train)
        x3 = Downsample(nc[2], act=act, name="ds2")(
            convs(x2, nc[1], self.nb, "down2"), train)
        x4 = Downsample(nc[3], act=act, name="ds3")(
            convs(x3, nc[2], self.nb, "down3"), train)
        x = convs(x4, nc[3], self.nb + 1, "body")
        x = convs(Upsample(nc[2], act=act, use_bn=bn, name="us3")(x + x4, train),
                  nc[2], self.nb, "up3", last_plain=True)
        x = convs(Upsample(nc[1], act=act, use_bn=bn, name="us2")(x + x3, train),
                  nc[1], self.nb, "up2", last_plain=True)
        x = convs(Upsample(nc[0], act=act, use_bn=bn, name="us1")(x + x2, train),
                  nc[0], self.nb, "up1", last_plain=True)
        return ConvAct(self.out_nc, act="none", name="tail")(x + x1, train) + x0


class NonLocalUNet(nn.Module):
    """UNet with embedded-Gaussian non-local attention wrapping the third
    scale: one block before down3's convs, one after up3's convs
    (reference network_unet.py:302-355)."""

    in_nc: int = 3
    out_nc: int = 3
    nc: Sequence[int] = (64, 128, 256, 512)
    nb: int = 1
    act_mode: str = "R"

    @nn.compact
    def __call__(self, x0, train: bool = False):
        nc, act = self.nc, _act_of(self.act_mode)

        def convs(x, c, n, scope):
            for i in range(n):
                x = ConvAct(c, act=act, name=f"{scope}_c{i}")(x, train)
            return x

        x1 = ConvAct(nc[0], act=act, name="head")(x0, train)
        x2 = Downsample(nc[1], act=act, name="ds1")(
            convs(x1, nc[0], self.nb, "down1"), train)
        x3 = Downsample(nc[2], act=act, name="ds2")(
            convs(x2, nc[1], self.nb, "down2"), train)
        y = NonLocalBlock2D(nc[2], name="nl_down")(x3, train)
        x4 = Downsample(nc[3], act=act, name="ds3")(
            convs(y, nc[2], self.nb, "down3"), train)
        x = convs(x4, nc[3], self.nb + 1, "body")
        x = convs(Upsample(nc[2], act=act, name="us3")(x + x4, train),
                  nc[2], self.nb, "up3")
        x = NonLocalBlock2D(nc[2], name="nl_up")(x, train)
        x = convs(Upsample(nc[1], act=act, name="us2")(x + x3, train),
                  nc[1], self.nb, "up2")
        x = convs(Upsample(nc[0], act=act, name="us1")(x + x2, train),
                  nc[0], self.nb, "up1")
        return ConvAct(self.out_nc, act="none", name="tail")(x + x1, train) + x0
