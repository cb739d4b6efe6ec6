"""The flagship model: LGU / "LLS-GUnroll" — a 4-scale autoencoder with
per-scale latent graph filtering.

Behavioural re-implementation of `AbtractMultiScaleGraphFilter`
(/root/reference/exploration/GGTV_GGLR_v1.0/deep_multiscale_GGLR_GGTV_v1x0.py:1028-1173).
API mirrors the reference: encode / filtering / decode / enc_dec / __call__
(the 3-term training loss needs encode+decode separately).

Flagship config (reference scripts_v2/run_abtract_lightformer_GGTV_GGLR_sigma25.py:120-129):
dims=[48,96,192,384], hidden_dims=[96,192,384,768], ngraphs=[8,16,16,32],
nsubnets=[1,1,1,1], num_blocks=[4,6,6,8], num_blocks_out=4 → 13.28 M params.

Input: (B, H, W, 3) with H, W divisible by 16 (3 downsamples + the solver's
internal 2× scale).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from irdu_tpu.models.blocks import (
    LocalLowpassFilteringBlock,
    LocalNonLinearBlock,
    RegionalPixelEmbedding,
)
from irdu_tpu.models.layers import Downsample2x2, GroupedPointwise, Upsample2x2


class AbstractMultiScaleGraphFilter(nn.Module):
    n_channels_in: int = 3
    n_channels_out: int = 3
    dims: Sequence[int] = (48, 64, 96, 128)
    hidden_dims: Sequence[int] = (128, 192, 256, 384)
    nsubnets: Sequence[int] = (1, 1, 1, 1)
    ngraphs: Sequence[int] = (4, 4, 8, 8)
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_blocks_out: int = 4
    window: str = "cross4"
    # "plain" | "non_expansive" (v20: every encoder/decoder conv gain-
    # bounded) | "spectral_norm" (v21: every encoder/decoder conv
    # spectral-normalized). The solver's feature heads stay plain, as in
    # the reference (v20/v21 only swap the encoder/decoder convs).
    conv_variant: str = "plain"
    # inference-only: run encoder/decoder blocks through the fused Pallas
    # kernel (ops/pallas/gated_block.py)
    use_pallas_blocks: bool = False
    # inference-only: run the unrolled solvers through the fused CHW Pallas
    # kernels (ops/pallas/solver_chw.py); scales whose shapes don't qualify
    # fall back to the jnp path automatically
    use_pallas_solver: bool = False
    # inference-time FLOP reduction: truncate each solver unroll after k CG
    # steps (3 = exact reference semantics; see MixtureGTVGLR.eval_cg_iters)
    eval_cg_iters: int = 3
    # inference-time FLOP reduction #2 (NOT in the reference): apply the
    # graph filtering only at these scales, identity elsewhere. None = all
    # four (exact semantics). The scale-0 solve is the most expensive
    # (3.9 ms of the 23.2 ms frame at 512² — PERF.md); dropping fine-scale
    # filtering trades measured PSNR for throughput, the flagship-side
    # analogue of the pixel family's hypothesis count.
    eval_filter_scales: Sequence[int] | None = None
    # training-memory knob: rematerialize each encoder/decoder block and
    # each filtering block on the backward pass (jax.checkpoint via
    # nn.remat). Without it the flagship's 192²+ training stages exceed
    # 16 GB HBM on v5e; forward-only inference is unaffected.
    remat: bool = False

    def setup(self):
        d, hd, ns = self.dims, self.hidden_dims, self.nsubnets
        cv = self.conv_variant
        up = self.use_pallas_blocks
        Block = nn.remat(LocalNonLinearBlock) if self.remat else LocalNonLinearBlock
        Filter = (nn.remat(LocalLowpassFilteringBlock) if self.remat
                  else LocalLowpassFilteringBlock)

        self.patch_3x3_embeding = RegionalPixelEmbedding(d[0], conv_variant=cv)
        self.encoder_scales = [
            [
                Block(d[s], hd[s], ns[s], conv_variant=cv,
                      use_pallas=up,
                      name=f"encoder_scale_{s:02d}_{i}")
                for i in range(self.num_blocks[s])
            ]
            for s in range(4)
        ]
        self.down_samples = [
            Downsample2x2(d[s + 1], groups=ns[s], variant=cv,
                          name=f"down_sample_{s:02d}_{s + 1:02d}")
            for s in range(3)
        ]

        self.local_filters = [
            Filter(
                dim=d[s], ngraphs=self.ngraphs[s], nsubnets=ns[s],
                window=self.window, use_pallas_solver=self.use_pallas_solver,
                eval_cg_iters=self.eval_cg_iters,
                name=f"localfilter_scale_{s:02d}",
            )
            for s in range(4)
        ]

        self.up_samples = [
            Upsample2x2(d[s], groups=ns[s + 1], variant=cv,
                        name=f"up_sample_{s + 1:02d}_{s:02d}")
            for s in range(3)
        ]
        self.combine_channels = [
            GroupedPointwise(features=d[s], groups=ns[s], variant=cv,
                             name=f"combine_channels_{s:02d}")
            for s in range(3)
        ]
        self.decoder_scales = [
            [
                Block(d[s], hd[s], ns[s], conv_variant=cv,
                      use_pallas=up,
                      name=f"decoder_scale_{s:02d}_{i}")
                for i in range(self.num_blocks[s])
            ]
            for s in range(3)
        ]
        self.refining_block = [
            Block(d[0], hd[0], ns[0], conv_variant=cv,
                  use_pallas=up,
                  name=f"refining_block_{i}")
            for i in range(self.num_blocks_out)
        ]
        self.linear_output = GroupedPointwise(features=self.n_channels_out,
                                              variant=cv, name="linear_output")

    def encode(self, img: jnp.ndarray):
        """4-scale encoder; returns the per-scale codes (reference encode,
        v1x0.py:1101-1115)."""
        x = self.patch_3x3_embeding(img)
        codes = []
        for s in range(4):
            for block in self.encoder_scales[s]:
                x = block(x)
            codes.append(x)
            if s < 3:
                x = self.down_samples[s](x)
        return tuple(codes)

    # -- CHW fast path -----------------------------------------------------
    #
    # Inference-only: activations ride (B, C, H, W) — the layout the fused
    # flat-lane kernels want (ops/pallas/block_stack; ops/pallas/solver_chw)
    # — so encoder/decoder block runs execute as ONE pallas_call per stack
    # and the solver consumes CHW directly, with no per-block transposes.
    # Numerics match the NHWC path to bf16 tolerance (same params, same
    # reference semantics); scales whose shapes don't qualify fall back to
    # the per-block NHWC kernel in place.

    def _fast_ok(self, img_shape) -> bool:
        _, h, w, _ = img_shape
        return (self.use_pallas_blocks
                and not self.is_initializing()
                and not self.remat
                and self.conv_variant == "plain"
                and all(n == 1 for n in self.nsubnets)
                and h % 16 == 0 and w % 16 == 0)

    def _run_blocks_fast(self, x, is_chw, blocks, dim):
        """Run a block list: stacked flat-lane kernel when the CHW shape
        qualifies, per-block NHWC kernel otherwise. Returns (x, is_chw)."""
        from irdu_tpu.models.chw import from_chw, to_chw
        from irdu_tpu.ops.pallas.block_stack import (
            fused_block_stack, pack_block_params, stack_ok)

        import jax

        b = x.shape[0]
        hw = (x.shape[2], x.shape[3]) if is_chw else (x.shape[1], x.shape[2])
        chw_shape = (b, dim, *hw)
        # Stacking wins only where NHWC lane occupancy is poor (C ≤ 64:
        # measured 1.23× at 512²×48/th32; at C=96 the halo waste eats the
        # occupancy gain — 0.79×, scripts/microbench_block_stack.py).
        if dim <= 64 and stack_ok(chw_shape, min(len(blocks), 4)):
            interp = jax.default_backend() != "tpu"  # CPU tests interpret
            if not is_chw:
                x = to_chw(x)
            k = 0
            while k < len(blocks):
                chunk = blocks[k: k + 4]
                packed = pack_block_params(
                    [blk.gated_params() for blk in chunk], x.dtype)
                x = fused_block_stack(x, *packed, interpret=interp)
                k += 4
            return x, True
        if is_chw:
            x = from_chw(x)
        for blk in blocks:
            x = blk(x)
        return x, False

    def _forward_fast(self, img: jnp.ndarray, filtering: bool) -> jnp.ndarray:
        from irdu_tpu.models.chw import (
            downsample2x2_chw, from_chw, pointwise_chw, to_chw, upsample2x2_chw)

        def as_chw(pair):
            x, c = pair
            return x if c else to_chw(x)

        x = self.patch_3x3_embeding(img)           # NHWC (XLA 3×3 conv)
        cur = (x, False)
        codes = []
        for s in range(4):
            cur = self._run_blocks_fast(*cur, self.encoder_scales[s],
                                        self.dims[s])
            codes.append(cur)
            if s < 3:
                x, is_chw = cur
                kern = self.down_samples[s].variables["params"]["kernel"]
                if is_chw:
                    cur = (downsample2x2_chw(x, kern), True)
                else:
                    cur = (self.down_samples[s](x), False)

        if filtering:
            keep = (self.eval_filter_scales if self.eval_filter_scales
                    is not None else range(4))
            codes = [
                codes[s] if s not in keep
                else (self.local_filters[s](as_chw(codes[s]), chw=True), True)
                if codes[s][1]
                else (self.local_filters[s](codes[s][0]), False)
                for s in range(4)
            ]

        x, is_chw = codes[3]
        for s in (2, 1, 0):
            kern = self.up_samples[s].variables["params"]["kernel"]
            skip, skip_chw = codes[s]
            if is_chw or skip_chw:
                x = upsample2x2_chw(x if is_chw else to_chw(x), kern)
                skip = skip if skip_chw else to_chw(skip)
                x = jnp.concatenate([x, skip], axis=1)
                kc = self.combine_channels[s].variables["params"]["kernel"]
                x = pointwise_chw(x, kc)
                is_chw = True
            else:
                x = self.up_samples[s](x)
                x = jnp.concatenate([x, skip], axis=-1)
                x = self.combine_channels[s](x)
            x, is_chw = self._run_blocks_fast(x, is_chw,
                                              self.decoder_scales[s],
                                              self.dims[s])
        x, is_chw = self._run_blocks_fast(x, is_chw, self.refining_block,
                                          self.dims[0])
        if is_chw:
            ko = self.linear_output.variables["params"]["kernel"]
            return from_chw(pointwise_chw(x, ko))
        return self.linear_output(x)

    def filtering(self, codes):
        """Per-scale unrolled graph filtering (reference filtering,
        v1x0.py:1117-1131). `eval_filter_scales` skips scales at
        inference (deployment knob, identity pass-through)."""
        keep = (self.eval_filter_scales if self.eval_filter_scales
                is not None else range(4))
        return tuple(
            self.local_filters[s](codes[s]) if s in keep else codes[s]
            for s in range(4)
        )

    def decode(self, codes):
        """Mirror decoder with skip-concat + 1×1 combine, refinement stack,
        linear head (reference decode, v1x0.py:1133-1161)."""
        x = codes[3]
        for s in (2, 1, 0):
            x = self.up_samples[s](x)
            x = jnp.concatenate([x, codes[s]], axis=-1)
            x = self.combine_channels[s](x)
            for block in self.decoder_scales[s]:
                x = block(x)
        for block in self.refining_block:
            x = block(x)
        return self.linear_output(x)

    def enc_dec(self, img: jnp.ndarray) -> jnp.ndarray:
        if self._fast_ok(img.shape):
            return self._forward_fast(img, filtering=False)
        return self.decode(self.encode(img))

    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        if self._fast_ok(img.shape):
            return self._forward_fast(img, filtering=True)
        return self.decode(self.filtering(self.encode(img)))


def flagship_config() -> dict:
    """The trained flagship (LGU) configuration."""
    return dict(
        n_channels_in=3,
        n_channels_out=3,
        dims=(48, 96, 192, 384),
        hidden_dims=(96, 192, 384, 768),
        nsubnets=(1, 1, 1, 1),
        ngraphs=(8, 16, 16, 32),
        num_blocks=(4, 6, 6, 8),
        num_blocks_out=4,
    )


def flagship_lite_config() -> dict:
    """FLOP-reduced deployment configuration (~4× fewer FLOPs than the
    flagship; NOT in the reference). Same architecture family — used for
    the PSNR-vs-MP/s tradeoff curve (VERDICT r1 #3); quality is measured
    by training both configs identically and comparing protocol PSNR."""
    return dict(
        n_channels_in=3,
        n_channels_out=3,
        dims=(24, 48, 96, 192),
        hidden_dims=(48, 96, 192, 384),
        nsubnets=(1, 1, 1, 1),
        ngraphs=(4, 8, 8, 16),
        num_blocks=(2, 3, 3, 4),
        num_blocks_out=2,
    )


def flagship_micro_config() -> dict:
    """Aggressively FLOP-reduced configuration (~12× fewer FLOPs); the
    high-throughput end of the PSNR-vs-MP/s curve."""
    return dict(
        n_channels_in=3,
        n_channels_out=3,
        dims=(16, 32, 64, 128),
        hidden_dims=(32, 64, 128, 256),
        nsubnets=(1, 1, 1, 1),
        ngraphs=(4, 4, 8, 8),
        num_blocks=(2, 2, 2, 2),
        num_blocks_out=2,
    )
