"""Restormer baseline: numerical parity vs the reference's torch copy."""

import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from irdu_tpu.baselines.restormer import Restormer


def _convert_restormer(state_dict):
    from flagship_bridge import _conv3x3, _pointwise, _set

    tree: dict = {}
    for name, tensor in state_dict.items():
        w = tensor.detach().numpy()
        parts = name.split(".")
        top = parts[0]
        if top in ("patch_embed",):
            _set(tree, ("patch_embed", "kernel"), _conv3x3(w))
        elif top == "output":
            _set(tree, ("output", "kernel"), _conv3x3(w))
        elif top.startswith(("down", "up")):
            # down1_2.body.0.weight -> down1_2_conv/kernel
            _set(tree, (f"{top}_conv", "kernel"), _conv3x3(w))
        elif top.startswith("reduce_chan"):
            _set(tree, (top, "kernel"), _pointwise(w))
        elif top in ("encoder_level1", "encoder_level2", "encoder_level3",
                     "latent", "decoder_level1", "decoder_level2",
                     "decoder_level3", "refinement"):
            scope = f"{top}_{parts[1]}"
            rest = parts[2:]
            if rest[0] in ("norm1", "norm2"):
                # norm1.body.weight / .bias
                _set(tree, (scope, rest[0], rest[2]), np.ascontiguousarray(w))
            elif rest[0] == "attn":
                if rest[1] == "temperature":
                    _set(tree, (scope, "attn", "temperature"), np.ascontiguousarray(w))
                elif rest[1] == "qkv_dwconv":
                    _set(tree, (scope, "attn", "qkv_dwconv", "kernel"), _conv3x3(w))
                else:
                    _set(tree, (scope, "attn", rest[1], "kernel"), _pointwise(w))
            elif rest[0] == "ffn":
                conv = _conv3x3(w) if rest[1] == "dwconv" else _pointwise(w)
                _set(tree, (scope, "ffn", rest[1], "kernel"), conv)
            else:
                raise KeyError(name)
        else:
            raise KeyError(name)
    return tree


@requires_reference
@pytest.mark.parametrize("norm_type", ["BiasFree", "WithBias"])
def test_restormer_parity(rng, norm_type):
    import torch
    from torch_bridge import load_reference_module

    ref = load_reference_module(
        "/root/reference/exploration/model_multiscale_mixture_GLR/lib/baselineRestormer.py",
        "ref_restormer",
    )
    torch.manual_seed(0)
    tm = ref.Restormer(dim=8, num_blocks=[1, 1, 1, 1], num_refinement_blocks=1,
                       heads=[1, 1, 2, 2], ffn_expansion_factor=2.66,
                       bias=False, LayerNorm_type=norm_type)
    tm.eval()

    model = Restormer(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
                      heads=(1, 1, 2, 2), norm_type=norm_type)
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    init_params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    converted = _convert_restormer(tm.state_dict())

    init_paths = {jax.tree_util.keystr(p): l.shape
                  for p, l in jax.tree_util.tree_leaves_with_path(init_params["params"])}
    conv_paths = {jax.tree_util.keystr(p): l.shape
                  for p, l in jax.tree_util.tree_leaves_with_path(converted)}
    assert init_paths == conv_paths, set(init_paths) ^ set(conv_paths)

    with torch.no_grad():
        ref_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ours = np.asarray(model.apply({"params": converted}, jnp.asarray(x)))
    np.testing.assert_allclose(
        ours, ref_out.numpy().transpose(0, 2, 3, 1), atol=5e-4, rtol=1e-3)


@requires_reference
def test_dncnn_parity(rng):
    import sys
    import torch
    from flagship_bridge import _conv3x3, _set
    from torch_bridge import load_reference_module

    sys.path.insert(0, "/root/reference/exploration/model_multiscale_mixture_GLR/lib/baselineDRUnet")
    ref = load_reference_module(
        "/root/reference/exploration/model_multiscale_mixture_GLR/lib/baselineDRUnet/network_dncnn.py",
        "ref_dncnn",
    )
    torch.manual_seed(0)
    tm = ref.DnCNN(in_nc=1, out_nc=1, nc=8, nb=5, act_mode="R")
    tm.eval()

    from irdu_tpu.baselines.drunet import DnCNN

    model = DnCNN(in_nc=1, out_nc=1, nc=8, nb=5, act_mode="R")
    x = rng.rand(1, 24, 24, 1).astype(np.float32)
    init_params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))

    tree = {}
    # torch sequential: model.0 (head conv) .2.. (body) last (tail); reLU are
    # fused into 'CR' convs, so indices are 0..nb-1 of conv layers
    conv_idx = sorted({int(k.split(".")[1]) for k in tm.state_dict()})
    names = ["head"] + [f"body_{i}" for i in range(len(conv_idx) - 2)] + ["tail"]
    for idx, scope in zip(conv_idx, names):
        w = tm.state_dict()[f"model.{idx}.weight"].numpy()
        b = tm.state_dict()[f"model.{idx}.bias"].numpy()
        _set(tree, (scope, "kernel"), _conv3x3(w))
        _set(tree, (scope, "bias"), np.ascontiguousarray(b))

    with torch.no_grad():
        ref_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ours = np.asarray(model.apply({"params": tree}, jnp.asarray(x)))
    np.testing.assert_allclose(
        ours, ref_out.numpy().transpose(0, 2, 3, 1), atol=2e-5, rtol=1e-4)


@requires_reference
def test_unetres_parity(rng):
    import sys
    import torch
    from flagship_bridge import _conv3x3, _set
    from torch_bridge import load_reference_module

    sys.path.insert(0, "/root/reference/exploration/model_multiscale_mixture_GLR/lib/baselineDRUnet")
    ref = load_reference_module(
        "/root/reference/exploration/model_multiscale_mixture_GLR/lib/baselineDRUnet/network_unet.py",
        "ref_unet",
    )
    torch.manual_seed(0)
    tm = ref.UNetRes(in_nc=1, out_nc=1, nc=[4, 8, 16, 32], nb=1, act_mode="R")
    tm.eval()

    from irdu_tpu.baselines.drunet import UNetRes

    model = UNetRes(in_nc=1, out_nc=1, nc=(4, 8, 16, 32), nb=1)
    x = rng.rand(1, 32, 32, 1).astype(np.float32)
    init_params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))

    tree = {}
    sd = tm.state_dict()
    _set(tree, ("head", "kernel"), _conv3x3(sd["m_head.weight"].numpy()))
    _set(tree, ("tail", "kernel"), _conv3x3(sd["m_tail.weight"].numpy()))
    import re

    for stage, scope in (("m_down1", "down1"), ("m_down2", "down2"),
                         ("m_down3", "down3"), ("m_body", "body"),
                         ("m_up3", "up3"), ("m_up2", "up2"), ("m_up1", "up1")):
        # torch B.sequential flattens single-module stages, so keys may be
        # m_body.res.0.weight (no index) or m_down1.0.res.0.weight
        stage_keys = sorted(k for k in sd if k.startswith(stage + "."))
        res_first = [k for k in stage_keys if re.search(r"res\.0\.weight$", k)]
        res_second = [k for k in stage_keys if re.search(r"res\.2\.weight$", k)]
        resampler = [k for k in stage_keys if ".res." not in k and k.endswith(".weight")]
        for res_i, (k1, k2) in enumerate(zip(res_first, res_second)):
            _set(tree, (f"{scope}_res{res_i}", "conv1", "kernel"), _conv3x3(sd[k1].numpy()))
            _set(tree, (f"{scope}_res{res_i}", "conv2", "kernel"), _conv3x3(sd[k2].numpy()))
        for k in resampler:
            w = sd[k].numpy()
            n = scope.replace("down", "ds") if stage.startswith("m_down") else scope.replace("up", "us")
            _set(tree, (f"{n}_kernel",), np.ascontiguousarray(
                np.transpose(w, (2, 3, 1, 0))))

    init_paths = {jax.tree_util.keystr(p): l.shape
                  for p, l in jax.tree_util.tree_leaves_with_path(init_params["params"])}
    conv_paths = {jax.tree_util.keystr(p): l.shape
                  for p, l in jax.tree_util.tree_leaves_with_path(tree)}
    assert init_paths == conv_paths, set(init_paths) ^ set(conv_paths)

    with torch.no_grad():
        ref_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ours = np.asarray(model.apply({"params": tree}, jnp.asarray(x)))
    np.testing.assert_allclose(
        ours, ref_out.numpy().transpose(0, 2, 3, 1), atol=5e-5, rtol=1e-4)


@requires_reference
def test_swinir_parity(rng):
    import sys
    import types

    import torch
    from flagship_bridge import _conv3x3, _set
    from torch_bridge import load_reference_module

    # the reference imports timm (absent here) only for DropPath/to_2tuple/
    # trunc_normal_ — stub them
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=None):
                super().__init__()

            def forward(self, x):
                return x

        layers.DropPath = DropPath
        layers.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
        layers.trunc_normal_ = lambda t, std=0.02: torch.nn.init.trunc_normal_(t, std=std)
        models.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    ref = load_reference_module(
        "/root/reference/exploration/model_multiscale_mixture_GLR/lib/baselineSwinSR.py",
        "ref_swinir",
    )
    torch.manual_seed(0)
    tm = ref.SwinIR(img_size=16, in_chans=3, embed_dim=16, depths=[2, 2],
                    num_heads=[2, 2], window_size=8, mlp_ratio=2.0,
                    upsampler="", img_range=1.0)
    tm.eval()

    from irdu_tpu.baselines.swinir import SwinIR

    model = SwinIR(embed_dim=16, depths=(2, 2), num_heads=(2, 2), window_size=8)
    x = rng.rand(1, 16, 16, 3).astype(np.float32)
    init_params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))

    tree = {}
    for name, tensor in tm.state_dict().items():
        w = tensor.detach().numpy()
        if "relative_position_index" in name or "attn_mask" in name or name == "mean":
            continue
        parts = name.split(".")
        if parts[0] in ("conv_first", "conv_after_body", "conv_last"):
            key = "kernel" if parts[1] == "weight" else "bias"
            _set(tree, (parts[0], key), _conv3x3(w) if key == "kernel" else np.ascontiguousarray(w))
        elif name.startswith("patch_embed.norm."):
            _set(tree, ("patch_norm", "scale" if parts[-1] == "weight" else "bias"),
                 np.ascontiguousarray(w))
        elif parts[0] == "norm":
            _set(tree, ("norm", "scale" if parts[-1] == "weight" else "bias"),
                 np.ascontiguousarray(w))
        elif parts[0] == "layers":
            li = int(parts[1])
            if parts[2] == "conv":
                key = "kernel" if parts[3] == "weight" else "bias"
                _set(tree, (f"layers_{li}", "conv", key),
                     _conv3x3(w) if key == "kernel" else np.ascontiguousarray(w))
                continue
            assert parts[2] == "residual_group" and parts[3] == "blocks"
            bi = int(parts[4])
            scope = (f"layers_{li}", f"block_{bi}")
            sub = parts[5:]
            if sub[0] in ("norm1", "norm2"):
                _set(tree, scope + (sub[0], "scale" if sub[1] == "weight" else "bias"),
                     np.ascontiguousarray(w))
            elif sub[0] == "attn":
                if sub[1] == "relative_position_bias_table":
                    _set(tree, scope + ("attn", "relative_position_bias_table"),
                         np.ascontiguousarray(w))
                else:  # qkv / proj dense
                    key = "kernel" if sub[2] == "weight" else "bias"
                    val = np.ascontiguousarray(w.T) if key == "kernel" else np.ascontiguousarray(w)
                    _set(tree, scope + ("attn", sub[1], key), val)
            elif sub[0] == "mlp":
                target = {"fc1": "mlp_fc1", "fc2": "mlp_fc2"}[sub[1]]
                key = "kernel" if sub[2] == "weight" else "bias"
                val = np.ascontiguousarray(w.T) if key == "kernel" else np.ascontiguousarray(w)
                _set(tree, scope + (target, key), val)
            else:
                raise KeyError(name)
        else:
            raise KeyError(name)

    init_paths = {jax.tree_util.keystr(p): l.shape
                  for p, l in jax.tree_util.tree_leaves_with_path(init_params["params"])}
    conv_paths = {jax.tree_util.keystr(p): l.shape
                  for p, l in jax.tree_util.tree_leaves_with_path(tree)}
    assert init_paths == conv_paths, set(init_paths) ^ set(conv_paths)

    with torch.no_grad():
        ref_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ours = np.asarray(model.apply({"params": tree}, jnp.asarray(x)))
    np.testing.assert_allclose(
        ours, ref_out.numpy().transpose(0, 2, 3, 1), atol=5e-4, rtol=1e-3)


@requires_reference
def test_ircnn_fdncnn_parity(rng):
    import sys
    import torch
    from flagship_bridge import _conv3x3, _set
    from torch_bridge import load_reference_module

    sys.path.insert(0, "/root/reference/exploration/model_multiscale_mixture_GLR/lib/baselineDRUnet")
    ref = load_reference_module(
        "/root/reference/exploration/model_multiscale_mixture_GLR/lib/baselineDRUnet/network_dncnn.py",
        "ref_dncnn",
    )
    from irdu_tpu.baselines.drunet import FDnCNN, IRCNN

    torch.manual_seed(1)
    x = rng.rand(1, 24, 24, 2).astype(np.float32)

    # FDnCNN (in_nc=2: image + noise map channel)
    tm = ref.FDnCNN(in_nc=2, out_nc=1, nc=8, nb=4, act_mode="R")
    tm.eval()
    model = FDnCNN(in_nc=2, out_nc=1, nc=8, nb=4)
    tree = {}
    conv_idx = sorted({int(k.split(".")[1]) for k in tm.state_dict()})
    names = ["head"] + [f"body_{i}" for i in range(len(conv_idx) - 2)] + ["tail"]
    for idx, scope in zip(conv_idx, names):
        _set(tree, (scope, "kernel"), _conv3x3(tm.state_dict()[f"model.{idx}.weight"].numpy()))
        _set(tree, (scope, "bias"), np.ascontiguousarray(tm.state_dict()[f"model.{idx}.bias"].numpy()))
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ours = np.asarray(model.apply({"params": tree}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref_out.numpy().transpose(0, 2, 3, 1),
                               atol=2e-5, rtol=1e-4)

    # IRCNN (dilated 7-layer)
    x1 = x[..., :1]
    tm = ref.IRCNN(in_nc=1, out_nc=1, nc=8)
    tm.eval()
    model = IRCNN(in_nc=1, out_nc=1, nc=8)
    tree = {}
    conv_idx = sorted({int(k.split(".")[1]) for k in tm.state_dict()})
    for i, idx in enumerate(conv_idx):
        _set(tree, (f"layer_{i}", "kernel"), _conv3x3(tm.state_dict()[f"model.{idx}.weight"].numpy()))
        _set(tree, (f"layer_{i}", "bias"), np.ascontiguousarray(tm.state_dict()[f"model.{idx}.bias"].numpy()))
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(np.transpose(x1, (0, 3, 1, 2))))
    ours = np.asarray(model.apply({"params": tree}, jnp.asarray(x1)))
    np.testing.assert_allclose(ours, ref_out.numpy().transpose(0, 2, 3, 1),
                               atol=2e-5, rtol=1e-4)
