"""CLI entry: ``python -m irdu_tpu.train --config configs/flagship_sigma25.yaml``

The YAML-driven trainer the reference's run_train.py intended to be."""

from __future__ import annotations

import argparse
import os


def _force_platform(platform: str, n_virtual: int) -> None:
    """Force the JAX backend BEFORE the first device query.

    Setting the env var alone is not enough when something (e.g. a
    sitecustomize) already imported jax with another platform — both the
    env var and ``jax.config`` must be set (tests/conftest.py recipe).
    """
    os.environ["JAX_PLATFORMS"] = platform
    if platform == "cpu" and n_virtual > 1:
        flags = os.environ.get("XLA_FLAGS", "")
        opt = f"--xla_force_host_platform_device_count={n_virtual}"
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = f"{flags} {opt}".strip()
    import jax

    jax.config.update("jax_platforms", platform)


def main():
    parser = argparse.ArgumentParser(description="irdu_tpu trainer")
    parser.add_argument("--config", "-c", required=True, help="YAML config path")
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                        help="force the JAX backend (overrides any preloaded "
                             "platform); with cpu, --virtual-devices N builds "
                             "an N-device host mesh for dp/tp dry runs")
    parser.add_argument("--virtual-devices", type=int, default=1,
                        help="with --platform cpu: number of virtual host "
                             "devices (XLA force_host_platform_device_count)")
    parser.add_argument("--set", "-s", dest="overrides", action="append",
                        default=[], metavar="KEY=VALUE",
                        help="dotted-path config override, YAML-parsed "
                             "(e.g. -s train.max_steps=800 "
                             "-s datasets.train.csv_path=corpus/train.csv); "
                             "repeatable")
    args = parser.parse_args()
    if args.platform:
        _force_platform(args.platform, args.virtual_devices)

    from irdu_tpu.train.trainer import Trainer
    from irdu_tpu.utils.config import apply_overrides, load_config

    config = apply_overrides(load_config(args.config), args.overrides)
    trainer = Trainer(config, workdir=args.workdir)
    trainer.run()


if __name__ == "__main__":
    main()
