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
