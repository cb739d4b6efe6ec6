"""DRUNet-family baselines (Zhang et al.) — NHWC flax.

Behavioural re-implementations of the reference's bundled comparison
models (/root/reference/exploration/model_multiscale_mixture_GLR/lib/
baselineDRUnet/): `DnCNN` (residual conv stack, network_dncnn.py:39),
`FDnCNN` (:129, no residual), `IRCNN` (:74, dilated 7-layer), and
`UNetRes` ("DRUNet", network_unet.py:67 — 4-scale strided-conv U-Net of
bias-free ResBlocks with a global residual path).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from irdu_tpu.models.layers import Conv3x3Zero, torch_conv_init


class ConvAct(nn.Module):
    features: int
    use_bias: bool = True
    act: str = "relu"  # "relu" | "none"
    dilation: int = 1
    stride: int = 1
    use_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        fan_in = c_in * 9
        kernel = self.param("kernel", torch_conv_init(fan_in),
                            (3, 3, c_in, self.features))
        pad = self.dilation
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
        if self.act == "relu":
            y = nn.relu(y)
        return y


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
    """Bias-free conv-relu-conv residual block (basicblock ResBlock 'CRC')."""

    nc: int

    @nn.compact
    def __call__(self, x):
        y = Conv3x3Zero(features=self.nc, name="conv1")(x)
        y = nn.relu(y)
        y = Conv3x3Zero(features=self.nc, name="conv2")(y)
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
