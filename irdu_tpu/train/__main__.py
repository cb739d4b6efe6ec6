"""CLI entry: ``python -m irdu_tpu.train --config configs/flagship_sigma25.yaml``

The YAML-driven trainer the reference's run_train.py intended to be."""

from __future__ import annotations

import argparse

from irdu_tpu.train.trainer import Trainer
from irdu_tpu.utils.config import apply_overrides, load_config


def main():
    parser = argparse.ArgumentParser(description="irdu_tpu trainer")
    parser.add_argument("--config", "-c", required=True, help="YAML config path")
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--set", "-s", dest="overrides", action="append",
                        default=[], metavar="KEY=VALUE",
                        help="dotted-path config override, YAML-parsed "
                             "(e.g. -s train.max_steps=800 "
                             "-s datasets.train.csv_path=corpus/train.csv); "
                             "repeatable")
    args = parser.parse_args()
    config = apply_overrides(load_config(args.config), args.overrides)
    trainer = Trainer(config, workdir=args.workdir)
    trainer.run()


if __name__ == "__main__":
    main()
