"""Every shipped YAML config parses, validates, and constructs its model —
the "12 reference trainer scripts → configs" matrix (SURVEY.md §2.7)."""

import glob
import os

import pytest

from irdu_tpu.models.registry import available_models, create_model
from irdu_tpu.utils.config import apply_overrides, load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_parses_and_model_constructs(path):
    conf = load_config(path)
    model_conf = dict(conf["model"])
    model = create_model(model_conf.pop("type"), **model_conf)
    assert model is not None
    assert conf["train"]["stages"]


def test_config_matrix_covers_reference_scripts():
    """The §2.7 table: each reference trainer script has a config."""
    names = {os.path.basename(p) for p in CONFIGS}
    required = {
        # scripts_v2/run_abtract_lightformer_GGTV_GGLR_sigma{15,25,50}.py
        "flagship_sigma15.yaml", "flagship_sigma25.yaml", "flagship_sigma50.yaml",
        # scripts/run_abtract_lightformer_GGTV_GGLR_sigma25.py (old 2-term loss)
        "flagship_sigma25_2term.yaml",
        # scripts/run_abtract_lightformer_GGTV_GGLR_testing.py (dataloader_v3)
        "flagship_sigma25_testing.yaml",
        # scripts/run_lightformer_GGTV_GGLR_sigma*.py (pixel family)
        "lightformer_pixel_sigma.yaml",
        # scripts/run_lightformer_GGTV_GGLR_multiblocks.py (v7, n_cnn_fts=128)
        "lightformer_pixel_multiblocks.yaml",
        # scripts/run_lightformer_GTVGLR.py (v4 no-stats core, 16 graphs)
        "lightformer_pixel_v4.yaml",
        # scripts/run_REstormer_sigma25.py
        "restormer_sigma25.yaml",
        # scripts/run_ablation_study_no_mixture.py
        "ablation_no_mixture.yaml",
        # scripts/run_ablation_study_no_order.py
        "ablation_no_orders.yaml",
        # scripts/ablation_runs/run_ablation_study_no_latent{,_no_mixture}.py
        "ablation_no_latent.yaml", "ablation_no_latent_no_mixture.yaml",
        # .../no_latent_no_mixture_no_order{,_noGTV}.py
        "ablation_no_orders_split.yaml", "ablation_no_orders_noGTV.yaml",
    }
    missing = required - names
    assert not missing, f"missing configs: {sorted(missing)}"


def test_registry_exposes_all_baselines():
    models = set(available_models())
    assert {"restormer", "swinir", "drunet", "dncnn", "ircnn", "fdncnn"} <= models
    # conv variants reachable from config
    m = create_model("abstract_multiscale_graph_filter",
                     conv_variant="non_expansive")
    assert m.conv_variant == "non_expansive"


def test_apply_overrides_dotted_paths_and_yaml_values():
    """`python -m irdu_tpu.train -c cfg.yaml -s key.path=value` semantics:
    dotted paths create/replace nested keys, values are YAML-parsed."""
    conf = {"name": "x", "train": {"max_steps": 100, "stages": [1]},
            "datasets": {"train": {"csv_path": "a.csv"}}}
    apply_overrides(conf, [
        "train.max_steps=800",                      # int, replaces
        "datasets.train.csv_path=other/train.csv",  # str
        "train.schedule.base_lr=1e-4",              # float, creates subtree
        "eval.sigma=25.0",                          # creates top-level
        "train.use_aux_losses=false",               # bool
    ])
    assert conf["train"]["max_steps"] == 800
    assert conf["datasets"]["train"]["csv_path"] == "other/train.csv"
    assert conf["train"]["schedule"]["base_lr"] == 1e-4
    assert conf["eval"]["sigma"] == 25.0
    assert conf["train"]["use_aux_losses"] is False
    assert conf["train"]["stages"] == [1]  # untouched siblings survive

    with pytest.raises(ValueError, match="key=value"):
        apply_overrides(conf, ["no-equals-sign"])
