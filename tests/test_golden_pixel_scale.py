"""Pixel-family (v6) SCALE golden parity (VERDICT r2 #7): the full
reference-scale MultiScaleSequenceDenoiser — 24 graphs × 3 node features,
diamond12 window, 72 cnn features, scalar-stats reflect-pad core — vs the
torch reference (model_GLR_GTV_deep_v6.py:802-1082) on a real image crop
through the full benchmark protocol (seed-2204 noise, reflect pad /16,
uint8-domain PSNR).

This family has the gnarliest quirk surface in the repo (raw-vs-log
params, accumulating ADMM bias, CG restart at round 2, reflect stats
padding); the tiny-dims parity test cannot see symmetric-graph or
scale-dependent slips, so this one runs the real configuration. Slow
(torch CPU forward + one jax compile; the jax side rides the persistent
compile cache on re-runs).
"""

import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from irdu_tpu.models.pixel import MultiScaleSequenceDenoiser

IMG = "/root/reference/exploration/GGTV_GGLR_v1.0/0020.png"


@pytest.mark.slow
@requires_reference
def test_pixel_v6_scale_benchmark_protocol_parity():
    import torch
    from PIL import Image
    from pixel_bridge import torch_to_flax_pixel
    from torch_bridge import load_lib

    from irdu_tpu.eval.harness import evaluate_pairs
    from irdu_tpu.eval.metrics import img_as_ubyte, psnr_255

    ref = load_lib("v6")
    torch.manual_seed(7)
    tm = ref.MultiScaleSequenceDenoiser(device=torch.device("cpu"))
    tm.eval()
    blk = tm.mixtureGLR_block03
    assert blk.n_graphs == 24 and blk.n_cnn_fts == 72  # the real v6 scale

    # randomize the solver scalars so parity isn't tested at init-symmetry
    # (multiM all-ones makes every graph identical at init)
    with torch.no_grad():
        g = torch.Generator().manual_seed(99)
        for mod in (blk.GTVmodule00, blk.GLRmodule00):
            mod.multiM.copy_(torch.rand(mod.multiM.shape, generator=g) + 0.5)
            for p in ("p01", "p02a", "p02b", "p03"):
                t = getattr(mod, f"stats_kernel_{p}")
                t.copy_(torch.rand(t.shape, generator=g))
        blk.ro00.copy_(torch.rand(blk.ro00.shape, generator=g) * 0.2)
        blk.muys00.copy_(torch.rand(blk.muys00.shape, generator=g) * 0.2)
        blk.gamma00.copy_(torch.rand(blk.gamma00.shape, generator=g) * 0.1 - 4.0)
        blk.alphaCGD.copy_(torch.rand(blk.alphaCGD.shape, generator=g) * 0.5)
        blk.betaCGD.copy_(torch.rand(blk.betaCGD.shape, generator=g) * 0.2)

    model = MultiScaleSequenceDenoiser()  # defaults ARE the v6 scale
    converted = {
        "mixtureGLR_block03": torch_to_flax_pixel(blk.state_dict()),
        "skip_connect_weight03": tm.skip_connect_weight03.detach().numpy(),
    }
    params = {"params": converted}

    img = np.asarray(Image.open(IMG))[300:428, 800:992]  # (128, 192, 3)
    assert img.shape == (128, 192, 3)

    fwd = jax.jit(model.apply)
    ours = evaluate_pairs(
        lambda x: np.asarray(fwd(params, jnp.asarray(x))),
        [img], sigma=25.0, seed=2204,
    )

    # the reference protocol, executed with torch
    rs = np.random.RandomState(2204)
    true_255 = img.astype(np.float32)
    noisy = true_255 / 255.0 + rs.normal(0, 25.0 / 255.0, true_255.shape)
    h, w = noisy.shape[:2]
    ph, pw = (16 - h % 16) % 16, (16 - w % 16) % 16
    t = torch.from_numpy(noisy.astype(np.float32)).permute(2, 0, 1)[None]
    t = torch.nn.functional.pad(t, (0, pw, 0, ph), "reflect")
    with torch.no_grad():
        restored = tm(t)
    restored = restored[0, :, :h, :w].permute(1, 2, 0).numpy()
    restored = img_as_ubyte(np.clip(restored, 0, 1)).astype(np.float32)
    ref_psnr = psnr_255(true_255, restored)

    np.testing.assert_allclose(ours["psnr"], [ref_psnr], atol=0.02)
