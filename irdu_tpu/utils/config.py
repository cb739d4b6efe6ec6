"""YAML config loading with light validation.

The reference's `environ/utils/custom_parser.py` loads YAML into an
OrderedDict with no schema; here the YAML path is the *only* path (the
reference's hard-coded experiment scripts become configs/*.yaml) and we
validate the handful of required keys early.
"""

from __future__ import annotations

import io
from typing import Any

import yaml

REQUIRED_TOP_KEYS = ("name", "model", "train")


def load_config(path: str | None = None, text: str | None = None,
                validate: bool = True) -> dict[str, Any]:
    if text is None:
        with open(path) as fh:
            text = fh.read()
    conf = yaml.safe_load(io.StringIO(text)) or {}
    if validate:
        missing = [k for k in REQUIRED_TOP_KEYS if k not in conf]
        if missing:
            raise ValueError(f"config missing required keys: {missing}")
    return conf


def apply_overrides(conf: dict[str, Any], overrides: list[str]) -> dict[str, Any]:
    """Apply ``a.b.c=value`` overrides in place (values YAML-parsed, so
    ``train.max_steps=800`` is an int and ``eval.datasets={}`` a dict).

    This is what lets the committed reference configs run in any
    environment: point ``datasets.train.csv_path`` at whatever corpus is
    on hand instead of editing the YAML (the reference's equivalent —
    editing hard-coded constants in 12 trainer scripts — is the workflow
    this replaces).
    """
    for item in overrides:
        key, sep, raw = item.partition("=")
        if not sep:
            raise ValueError(f"override {item!r} is not of the form key=value")
        node = conf
        parts = key.strip().split(".")
        for p in parts[:-1]:
            nxt = node.get(p)
            if not isinstance(nxt, dict):
                nxt = node[p] = {}
            node = nxt
        val = yaml.safe_load(raw) if raw != "" else None
        if isinstance(val, str):
            # YAML 1.1 reads bare scientific notation ("1e-4") as a string;
            # accept it as the float any CLI user means
            try:
                val = float(val)
            except ValueError:
                pass
        node[parts[-1]] = val
    return conf


def pretty_config(conf: dict, indent: int = 0) -> str:
    lines = []
    for key, value in conf.items():
        pad = "  " * indent
        if isinstance(value, dict):
            lines.append(f"{pad}{key}:")
            lines.append(pretty_config(value, indent + 1))
        else:
            lines.append(f"{pad}{key}: {value}")
    return "\n".join(lines)
