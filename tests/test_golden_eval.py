"""Golden end-to-end eval parity: the full benchmark protocol (seed-2204
noise, reflect pad to /16, uint8-domain PSNR) produces the same numbers
through our flagship as through the torch reference with identical
weights. Also: tiled inference matches whole-image inference."""

import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from irdu_tpu.data.synthetic import make_synthetic_image
from irdu_tpu.eval.harness import evaluate_pairs
from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter
from irdu_tpu.parallel.spatial import tiled_forward

TINY = dict(
    n_channels_in=3, n_channels_out=3,
    dims=(8, 12, 16, 24), hidden_dims=(16, 24, 32, 48),
    nsubnets=(1, 1, 1, 1), ngraphs=(2, 2, 4, 4),
    num_blocks=(1, 1, 1, 1), num_blocks_out=1,
)


@requires_reference
def test_benchmark_protocol_parity(rng):
    import torch
    from flagship_bridge import torch_to_flax_params
    from torch_bridge import load_v1x0
    from irdu_tpu.data.degradations import eval_noise
    from irdu_tpu.eval.metrics import img_as_ubyte, psnr_255

    ref = load_v1x0()
    torch.manual_seed(3)
    tm = ref.AbtractMultiScaleGraphFilter(
        dims=list(TINY["dims"]), hidden_dims=list(TINY["hidden_dims"]),
        nsubnets=list(TINY["nsubnets"]), ngraphs=list(TINY["ngraphs"]),
        num_blocks=list(TINY["num_blocks"]), num_blocks_out=TINY["num_blocks_out"],
    )
    tm.eval()
    model = AbstractMultiScaleGraphFilter(**TINY)
    params = {"params": torch_to_flax_params(
        tm.state_dict(), dims=TINY["dims"], ngraphs=TINY["ngraphs"])}

    images = [make_synthetic_image(np.random.RandomState(5), 70, 90),
              make_synthetic_image(np.random.RandomState(6), 64, 64)]

    ours = evaluate_pairs(
        lambda x: np.asarray(model.apply(params, jnp.asarray(x))),
        images, sigma=25.0, seed=2204,
    )

    # the reference protocol, executed with torch
    rs = np.random.RandomState(2204)
    ref_psnrs = []
    for img in images:
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
        ref_psnrs.append(psnr_255(true_255, restored))

    np.testing.assert_allclose(ours["psnr"], ref_psnrs, atol=0.02)


def test_tiled_matches_whole_image(rng):
    model = AbstractMultiScaleGraphFilter(**TINY)
    x = rng.rand(96, 128, 3).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x[None]))

    def forward(batch):
        return np.asarray(model.apply(params, jnp.asarray(batch)))

    whole = forward(x[None])[0]
    tiled = tiled_forward(forward, x, tile=32, halo=32, multiple=16)
    # halo covers the receptive field of the tiny model; interior must match
    np.testing.assert_allclose(tiled, whole, atol=5e-3)
