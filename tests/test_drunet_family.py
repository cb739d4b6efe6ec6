"""Parity for the remaining DRUNet-family comparison models and the
basicblock library vs the torch reference (network_unet.py /
basicblock.py). Complements test_baseline_parity.py's
DnCNN/FDnCNN/IRCNN/UNetRes coverage."""

import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from flagship_bridge import _set

DRUNET_DIR = ("/root/reference/exploration/model_multiscale_mixture_GLR/"
              "lib/baselineDRUnet")


def _hwio(w):
    # torch Conv2d (O,I,kh,kw) -> HWIO; torch ConvTranspose2d (I,O,kh,kw)
    # -> HWOI: the same axis permutation serves both layouts.
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _load_ref(name):
    import sys

    from torch_bridge import load_reference_module

    if DRUNET_DIR not in sys.path:
        sys.path.insert(0, DRUNET_DIR)
    return load_reference_module(f"{DRUNET_DIR}/{name}.py", f"ref_{name}")


def _convert_ordered(tm, scopes):
    """Walk the torch model's conv/convT/BN modules in registration order
    and map them onto our flax scopes (one scope per conv; a BatchNorm
    attaches to the conv it follows). Returns (params, batch_stats)."""
    import torch.nn as tnn

    tree: dict = {}
    bstats: dict = {}
    it = iter(scopes)
    last: tuple = ()
    for m in tm.modules():
        if isinstance(m, (tnn.Conv2d, tnn.ConvTranspose2d)):
            last = tuple(next(it).split("/"))
            _set(tree, last + ("kernel",), _hwio(m.weight.detach().numpy()))
            if m.bias is not None:
                _set(tree, last + ("bias",),
                     np.ascontiguousarray(m.bias.detach().numpy()))
        elif isinstance(m, tnn.BatchNorm2d):
            _set(tree, last + ("bn", "scale"),
                 np.ascontiguousarray(m.weight.detach().numpy()))
            _set(tree, last + ("bn", "bias"),
                 np.ascontiguousarray(m.bias.detach().numpy()))
            _set(bstats, last + ("bn", "mean"),
                 np.ascontiguousarray(m.running_mean.numpy()))
            _set(bstats, last + ("bn", "var"),
                 np.ascontiguousarray(m.running_var.numpy()))
    leftover = list(it)
    assert not leftover, f"unmapped scopes: {leftover}"
    return tree, bstats


def _check(model, tm, x, tree, bstats, atol=5e-5):
    import torch

    init_vars = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    init_paths = {jax.tree_util.keystr(p): l.shape
                  for p, l in jax.tree_util.tree_leaves_with_path(
                      init_vars["params"])}
    conv_paths = {jax.tree_util.keystr(p): l.shape
                  for p, l in jax.tree_util.tree_leaves_with_path(tree)}
    assert init_paths == conv_paths, sorted(
        set(init_paths) ^ set(conv_paths))

    variables = {"params": tree}
    if bstats:
        variables["batch_stats"] = bstats
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(
        ours, ref_out.numpy().transpose(0, 2, 3, 1), atol=atol, rtol=1e-4)


def _unet_scopes(nb, stage_convs, body_nb=None, down="ds", up="us"):
    """Scope list for the shared U-Net topology in torch registration
    order. stage_convs(scope, n) yields the per-stage conv scopes;
    body_nb defaults to nb+1 (UNet/UNetPlus/UNetResSubP) — ResUNet's
    body uses plain nb."""
    scopes = ["head"]
    for k in (1, 2, 3):
        scopes += stage_convs(f"down{k}", nb) + [f"{down}{k}/conv"]
    scopes += stage_convs("body", nb + 1 if body_nb is None else body_nb)
    for k in (3, 2, 1):
        scopes += [f"{up}{k}/conv"] + stage_convs(f"up{k}", nb)
    return scopes + ["tail"]


@requires_reference
def test_unet_parity(rng):
    import torch

    ref = _load_ref("network_unet")
    torch.manual_seed(0)
    tm = ref.UNet(in_nc=1, out_nc=1, nc=[4, 8, 16, 32], nb=2, act_mode="R")
    tm.eval()

    from irdu_tpu.baselines.drunet import UNet

    model = UNet(in_nc=1, out_nc=1, nc=(4, 8, 16, 32), nb=2)
    scopes = _unet_scopes(
        2, lambda s, n: [f"{s}_c{i}" for i in range(n)])
    # body has nb+1 convs but stage_convs already handles it via n
    tree, bstats = _convert_ordered(tm, scopes)
    x = rng.rand(1, 32, 32, 1).astype(np.float32)
    _check(model, tm, x, tree, bstats)


@requires_reference
def test_resunet_parity(rng):
    import torch

    ref = _load_ref("network_unet")
    torch.manual_seed(0)
    tm = ref.ResUNet(in_nc=1, out_nc=1, nc=[4, 8, 16, 32], nb=1, act_mode="L")
    tm.eval()

    from irdu_tpu.baselines.drunet import ResUNet

    model = ResUNet(in_nc=1, out_nc=1, nc=(4, 8, 16, 32), nb=1)
    imdb = ["conv1", "conv2", "conv3", "conv4", "conv1x1"]
    scopes = _unet_scopes(
        1, lambda s, n: [f"{s}_imdb{i}/{c}" for i in range(n) for c in imdb],
        body_nb=1)
    tree, bstats = _convert_ordered(tm, scopes)
    # 28x30: exercises the in-forward /8 replicate pad + crop
    x = rng.rand(1, 28, 30, 1).astype(np.float32)
    _check(model, tm, x, tree, bstats)


@requires_reference
def test_unetres_subp_parity(rng):
    import torch

    ref = _load_ref("network_unet")
    torch.manual_seed(0)
    tm = ref.UNetResSubP(in_nc=1, out_nc=1, nc=[4, 8, 16, 32], nb=1,
                         act_mode="R")
    tm.eval()

    from irdu_tpu.baselines.drunet import UNetResSubP

    model = UNetResSubP(in_nc=1, out_nc=1, nc=(4, 8, 16, 32), nb=1)

    def stage(s, n):
        names = [f"{s}_res{i}" for i in range(n)]
        if s == "body":  # reference body uses nb+1 blocks
            names = names[:-1] + ["body_res_extra"]
        return [f"r/conv{j}".replace("r", r) for r in names for j in (1, 2)]

    scopes = _unet_scopes(1, stage)
    tree, bstats = _convert_ordered(tm, scopes)
    x = rng.rand(1, 32, 32, 1).astype(np.float32)
    _check(model, tm, x, tree, bstats)


@requires_reference
def test_unetplus_parity(rng):
    import torch

    ref = _load_ref("network_unet")
    torch.manual_seed(0)
    tm = ref.UNetPlus(in_nc=3, out_nc=3, nc=[4, 8, 16, 32], nb=1,
                      act_mode="BR")
    # one train-mode pass gives the BatchNorms non-trivial running stats
    tm.train()
    with torch.no_grad():
        tm(torch.randn(2, 3, 32, 32))
    tm.eval()

    from irdu_tpu.baselines.drunet import UNetPlus

    model = UNetPlus(in_nc=3, out_nc=3, nc=(4, 8, 16, 32), nb=1,
                     act_mode="BR")
    scopes = _unet_scopes(
        1, lambda s, n: [f"{s}_c{i}" for i in range(n)])
    tree, bstats = _convert_ordered(tm, scopes)
    assert bstats, "UNetPlus parity must exercise BatchNorm conversion"
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    _check(model, tm, x, tree, bstats, atol=2e-4)


@requires_reference
def test_nonlocal_unet_parity(rng):
    import torch

    ref = _load_ref("network_unet")
    torch.manual_seed(0)
    tm = ref.NonLocalUNet(in_nc=3, out_nc=3, nc=[4, 8, 16, 32], nb=1,
                          act_mode="R")
    tm.train()
    with torch.no_grad():
        tm(torch.randn(2, 3, 32, 32))
    tm.eval()

    from irdu_tpu.baselines.drunet import NonLocalUNet

    model = NonLocalUNet(in_nc=3, out_nc=3, nc=(4, 8, 16, 32), nb=1)
    nl = ["w", "theta", "phi", "g"]  # torch registration order inside the block
    scopes = (["head"]
              + ["down1_c0", "ds1/conv", "down2_c0", "ds2/conv"]
              + [f"nl_down/{m}" for m in nl] + ["down3_c0", "ds3/conv"]
              + ["body_c0", "body_c1"]
              + ["us3/conv", "up3_c0"] + [f"nl_up/{m}" for m in nl]
              + ["us2/conv", "up2_c0", "us1/conv", "up1_c0", "tail"])
    tree, bstats = _convert_ordered(tm, scopes)
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    _check(model, tm, x, tree, bstats, atol=2e-4)


@requires_reference
def test_basicblocks_parity(rng):
    """RCAGroup (CA attention chain) and RRDB (dense blocks) vs torch."""
    import torch

    ref = _load_ref("basicblock")
    torch.manual_seed(0)

    from irdu_tpu.baselines.blocks import RCAGroup, RRDB

    tm = ref.RCAGroup(in_channels=8, out_channels=8, reduction=2, nb=2)
    tm.eval()
    scopes = []
    for i in range(2):
        scopes += [f"rcab{i}/conv1", f"rcab{i}/conv2",
                   f"rcab{i}/ca/fc1", f"rcab{i}/ca/fc2"]
    scopes += ["conv"]
    tree, _ = _convert_ordered(tm, scopes)
    x = rng.rand(1, 16, 16, 8).astype(np.float32)
    _check(RCAGroup(features=8, reduction=2, nb=2), tm, x, tree, {})

    tm = ref.RRDB(nc=8, gc=4)
    tm.eval()
    scopes = [f"rdb{k}/conv{i}" for k in (1, 2, 3) for i in range(1, 6)]
    tree, _ = _convert_ordered(tm, scopes)
    _check(RRDB(features=8, gc=4), tm, x, tree, {})


@requires_reference
def test_pixel_shuffle_matches_torch(rng):
    import torch

    from irdu_tpu.baselines.blocks import pixel_shuffle, pixel_unshuffle

    ref = _load_ref("basicblock")
    x = rng.rand(2, 8, 12, 4).astype(np.float32)  # NHWC
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref_un = ref.pixel_unshuffle(tx, 2).numpy().transpose(0, 2, 3, 1)
    ours_un = np.asarray(pixel_unshuffle(jnp.asarray(x), 2))
    np.testing.assert_array_equal(ours_un, ref_un)

    tshuf = torch.nn.PixelShuffle(2)(tx).numpy().transpose(0, 2, 3, 1)
    ours_shuf = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    np.testing.assert_array_equal(ours_shuf, tshuf)

    # round-trip identity
    np.testing.assert_array_equal(
        np.asarray(pixel_shuffle(jnp.asarray(ours_un), 2)), x)
