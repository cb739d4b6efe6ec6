"""Flagship-SCALE golden parity (VERDICT r1 #5): the full 13.28M-param
LGU configuration vs the torch reference on a real image (the reference's
own demo image, GGTV_GGLR_v1.0/0020.png — README.ipynb cell 12), through
the full benchmark protocol (seed-2204 noise, reflect pad to /16,
uint8-domain PSNR). Tiny-config golden tests can miss quirks that only
appear at 4 scales × 8-32 graphs; this one can't.

Slow (~10 min CPU first run; the jax compile is served by the persistent
cache afterwards). A 256×384 crop of the real image keeps the torch CPU
forward tractable while exercising every scale of the real model.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full 13.28M-model CPU jit (~10 min cold)

from conftest import requires_reference

import jax
import jax.numpy as jnp

from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter, flagship_config

IMG = "/root/reference/exploration/GGTV_GGLR_v1.0/0020.png"


@requires_reference
def test_flagship_scale_benchmark_protocol_parity():
    import torch
    from PIL import Image
    from flagship_bridge import torch_to_flax_params
    from torch_bridge import load_v1x0
    from irdu_tpu.eval.harness import evaluate_pairs
    from irdu_tpu.eval.metrics import img_as_ubyte, psnr_255

    cfg = flagship_config()
    ref = load_v1x0()
    torch.manual_seed(11)
    tm = ref.AbtractMultiScaleGraphFilter(
        dims=list(cfg["dims"]), hidden_dims=list(cfg["hidden_dims"]),
        nsubnets=list(cfg["nsubnets"]), ngraphs=list(cfg["ngraphs"]),
        num_blocks=list(cfg["num_blocks"]), num_blocks_out=cfg["num_blocks_out"],
    )
    tm.eval()
    n_params = sum(p.numel() for p in tm.parameters())
    assert n_params == 13_278_816  # the real flagship, not a toy

    model = AbstractMultiScaleGraphFilter(**cfg)
    params = {"params": torch_to_flax_params(
        tm.state_dict(), dims=cfg["dims"], ngraphs=cfg["ngraphs"])}

    img = np.asarray(Image.open(IMG))[300:556, 800:1184]  # (256, 384, 3) real content
    assert img.shape == (256, 384, 3)

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
