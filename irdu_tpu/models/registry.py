"""Model registry: config `model.type` strings → flax module constructors.

One configurable family per reference lineage (the reference's 23
near-duplicate model files collapse into these + config):

  abstract_multiscale_graph_filter  — flagship LGU (v13/v22/v1x0)
  multiscale_sequence_denoiser      — pixel-domain MixtureGTV family (v1–v8)
  multiscale_graph_filter           — no-latent ablation top
  one_graph_filter                  — no-latent no-mixture ablation top
  glr_boosting_pyramid              — multiscale GLR boosting (2002 notebook)
  restormer / swinir / drunet / dncnn / ircnn / fdncnn — baselines
  unet / resunet / unetres_subp / unetplus / nonlocal_unet — the rest of
    the reference's DRUNet-family comparison zoo (network_unet.py)
"""

from __future__ import annotations

from typing import Any, Callable

_REGISTRY: dict[str, Callable] = {}


def register_model(name: str):
    def deco(ctor):
        _REGISTRY[name] = ctor
        return ctor

    return deco


def available_models() -> list[str]:
    _ensure_builtin()
    return sorted(_REGISTRY)


def create_model(name: str, **kwargs) -> Any:
    _ensure_builtin()
    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; available: {available_models()}")
    return _REGISTRY[name](**kwargs)


def _ensure_builtin():
    if _REGISTRY:
        return
    from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter

    _REGISTRY["abstract_multiscale_graph_filter"] = AbstractMultiScaleGraphFilter
    try:
        from irdu_tpu.models.pixel import MultiScaleSequenceDenoiser

        _REGISTRY["multiscale_sequence_denoiser"] = MultiScaleSequenceDenoiser
    except ImportError:
        pass
    try:
        from irdu_tpu.models.ablations import MultiScaleGraphFilter, OneGraphFilter

        _REGISTRY["multiscale_graph_filter"] = MultiScaleGraphFilter
        _REGISTRY["one_graph_filter"] = OneGraphFilter
    except ImportError:
        pass
    try:
        from irdu_tpu.models.glr_boosting import GLRBoostingPyramid

        _REGISTRY["glr_boosting_pyramid"] = GLRBoostingPyramid
    except ImportError:
        pass
    try:
        from irdu_tpu.baselines.restormer import Restormer

        _REGISTRY["restormer"] = Restormer
    except ImportError:
        pass
    try:
        from irdu_tpu.baselines.drunet import (
            DnCNN,
            FDnCNN,
            IRCNN,
            NonLocalUNet,
            ResUNet,
            UNet,
            UNetPlus,
            UNetRes,
            UNetResSubP,
        )

        _REGISTRY["dncnn"] = DnCNN
        _REGISTRY["fdncnn"] = FDnCNN
        _REGISTRY["ircnn"] = IRCNN
        _REGISTRY["drunet"] = UNetRes
        _REGISTRY["unet"] = UNet
        _REGISTRY["resunet"] = ResUNet
        _REGISTRY["unetres_subp"] = UNetResSubP
        _REGISTRY["unetplus"] = UNetPlus
        _REGISTRY["nonlocal_unet"] = NonLocalUNet
    except ImportError:
        pass
    try:
        from irdu_tpu.baselines.swinir import SwinIR

        _REGISTRY["swinir"] = SwinIR
    except ImportError:
        pass
