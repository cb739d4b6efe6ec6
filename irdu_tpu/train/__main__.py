"""CLI entry: ``python -m irdu_tpu.train --config configs/flagship_sigma25.yaml``

The YAML-driven trainer the reference's run_train.py intended to be."""

from __future__ import annotations

import argparse

from irdu_tpu.train.trainer import Trainer
from irdu_tpu.utils.config import load_config


def main():
    parser = argparse.ArgumentParser(description="irdu_tpu trainer")
    parser.add_argument("--config", "-c", required=True, help="YAML config path")
    parser.add_argument("--workdir", default=None)
    args = parser.parse_args()
    trainer = Trainer(load_config(args.config), workdir=args.workdir)
    trainer.run()


if __name__ == "__main__":
    main()
