"""Window/stitch coverage of the sharded tiled-inference path.

ADVICE r4 #1: axis lengths strictly inside (tile, tile + 2·halo) fit a
single whole-axis window but still need one stitch core per `tile` —
the old small-axis branch emitted a single (0, 0) anchor and silently
left everything beyond `tile` as zeros. These tests pin total coverage
with an identity model (zero receptive field ⇒ the stitched output must
equal the input bit-for-bit for EVERY size), so any unwritten band or
mis-offset core fails loudly without a multi-minute model compile.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from irdu_tpu.parallel.mesh import make_mesh
from irdu_tpu.parallel.spatial import _axis_windows, sharded_tiled_forward


@pytest.mark.parametrize("size", [40, 48, 95, 96, 97, 128, 300, 513])
@pytest.mark.parametrize("step,halo", [(32, 32), (256, 32)])
def test_axis_windows_cover_axis(size, step, halo):
    anchors, pad = _axis_windows(size, step, halo)
    win = min(step + 2 * halo, size + pad)
    # cores partition [0, size)
    cores = [(c0, min(c0 + step, size)) for c0, _ in anchors]
    assert cores[0][0] == 0
    assert cores[-1][1] == size, "last core must reach the axis end"
    for (a0, a1), (b0, b1) in zip(cores, cores[1:]):
        assert b0 == a1, "cores must tile the axis without gaps"
    # every read window lies inside the (padded) axis and contains its core
    for c0, r0 in anchors:
        assert 0 <= r0 and r0 + win <= size + pad
        assert r0 <= c0 and min(c0 + step, size) <= r0 + win


@pytest.mark.parametrize(
    "h,w",
    [
        (40, 144),   # H in (tile, tile+2*halo) + /16 pad — the regression
        (48, 144),   # H in (tile, tile+2*halo), no pad needed
        (64, 40),    # W in the regression band
        (24, 24),    # both axes below one tile
        (112, 144),  # both ragged, normal branch (the old dryrun shape)
        (96, 96),    # exactly one window per axis
    ],
)
def test_sharded_tiled_identity_exact(h, w):
    """Identity model ⇒ stitched output == input exactly, any size."""
    mesh = make_mesh(jax.devices()[:8])
    img = np.random.RandomState(0).rand(h, w, 3).astype(np.float32)

    def apply_fn(params, batch):
        return batch * 1.0

    out = sharded_tiled_forward(apply_fn, {}, img, mesh, tile=32, halo=32)
    assert out.shape == img.shape
    np.testing.assert_array_equal(out, img)


def test_sharded_tiled_mean3_band():
    """3×3 box filter (1-px receptive field): interior must be exact and —
    because windows are anchored at true edges — the boundary too, for a
    size in the regression band."""
    mesh = make_mesh(jax.devices()[:8])
    img = np.random.RandomState(1).rand(48, 112, 3).astype(np.float32)

    def apply_fn(params, batch):
        x = jnp.pad(batch, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        s = sum(
            x[:, i:i + batch.shape[1], j:j + batch.shape[2]]
            for i in range(3)
            for j in range(3)
        )
        return s / 9.0

    out = sharded_tiled_forward(apply_fn, {}, img, mesh, tile=32, halo=32)
    whole = np.asarray(apply_fn({}, jnp.asarray(img[None])))[0]
    np.testing.assert_allclose(out, whole, atol=1e-6)
