"""Real-image adaptation run (round-3 priority #3, as far as the
environment allows): the only genuine photograph in the reference
snapshot is `exploration/GGTV_GGLR_v1.0/0020.png` (2040x1392 — the image
its README.ipynb cell 12 demos on). No DFWB/CBSD68 data exists here
(zero egress), so this run tiles that photograph into a 10-train /
2-held-out corpus, fine-tunes the flagship from the committed
synthetic-corpus snapshot, and reports the held-out seed-2204 uint8-PSNR
protocol number before and after.

What this proves that the synthetic runs cannot: the full data pipeline
(PNG -> CSV index -> PatchDataset -> augment -> noise) operating on a
real photograph's statistics, and that the synthetic-pretrained model
adapts to natural images rather than having overfit the corpus class.

Usage: python scripts/run_natural_finetune.py [--steps 800]
Run again to exercise auto-resume.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

REF_IMAGE = "/root/reference/exploration/GGTV_GGLR_v1.0/0020.png"
# 4x3 grid of 510x464 tiles exactly covers 2040x1392; two held-out tiles
# from different rows/columns so val sees distinct content.
VAL_TILES = {(1, 1), (2, 3)}


def build_corpus(root: str) -> None:
    from PIL import Image

    from irdu_tpu.data.dataset import build_image_index

    train_dir = os.path.join(root, "train_images")
    val_dir = os.path.join(root, "val_images")
    if os.path.exists(os.path.join(root, "train.csv")):
        return
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(val_dir, exist_ok=True)
    img = np.asarray(Image.open(REF_IMAGE).convert("RGB"))
    th, tw = 464, 510
    assert img.shape[0] % th == 0 and img.shape[1] % tw == 0, img.shape
    for r in range(img.shape[0] // th):
        for c in range(img.shape[1] // tw):
            tile = img[r * th:(r + 1) * th, c * tw:(c + 1) * tw]
            dest = val_dir if (r, c) in VAL_TILES else train_dir
            Image.fromarray(tile).save(
                os.path.join(dest, f"tile_r{r}c{c}.png"))
    build_image_index(train_dir, os.path.join(root, "train.csv"))
    build_image_index(val_dir, os.path.join(root, "val.csv"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="experiments/natural_0020")
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--init-weights",
                    default="artifacts/weights/flagship_synthetic_2050.npz")
    ap.add_argument("--save-weights",
                    default="artifacts/weights/flagship_natural_ft.npz")
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    build_corpus(args.root)

    import jax.numpy as jnp

    from irdu_tpu.models.flagship import flagship_config
    from irdu_tpu.train.trainer import Trainer
    from irdu_tpu.utils.weights import load_params_npz, save_params_npz

    mc = flagship_config()
    # reference fine-tune shape (README.ipynb cell 15 runs 20 steps at
    # 256^2 b1 lr 1e-4 as its sanity check; here a real schedule): two
    # progressive stages, annealed multistep at a reduced base LR.
    n1 = (args.steps * 3) // 4
    config = {
        "name": os.path.basename(args.root),
        "task": "denoise",
        "manual_seed": 2204,
        "model": {
            "type": "abstract_multiscale_graph_filter",
            "dims": list(mc["dims"]),
            "hidden_dims": list(mc["hidden_dims"]),
            "ngraphs": list(mc["ngraphs"]),
            "num_blocks": list(mc["num_blocks"]),
            "num_blocks_out": mc["num_blocks_out"],
            "remat": True,
        },
        "parallel": {"data_parallel": 1},
        "datasets": {
            "train": {
                "csv_path": os.path.join(args.root, "train.csv"),
                "root_folder": os.path.join(args.root, "train_images"),
                "dist_mode": "addictive_noise_scale",
                "lambda_noise": 25.0,
                "use_data_aug": True,
                "seed": 2204,
            }
        },
        "eval": {
            "sigma": 25.0,
            "bucket": 64,
            "datasets": {
                "natval": {
                    "csv_path": os.path.join(args.root, "val.csv"),
                    "root_folder": os.path.join(args.root, "val_images"),
                },
            },
        },
        "train": {
            "num_epochs": 1,
            "stages": [
                {"patch_size": 128, "batch_size": 4,
                 "max_num_patchs": 4 * n1},
                {"patch_size": 192, "batch_size": 3,
                 "max_num_patchs": 3 * (args.steps - n1)},
            ],
            "schedule": {"type": "multistep", "base_lr": 1.0e-4,
                         "milestones": [n1, (args.steps * 9) // 10],
                         "gamma": 0.5},
            "use_aux_losses": True,
            "verbose_rate": 50,
            "checkpoint_rate": 200,
            "eval_rate": 200,
            "max_steps": args.steps,
        },
    }

    trainer = Trainer(config, workdir=args.root)
    if int(trainer.state.step) == 0:
        params = load_params_npz(args.init_weights, dtype=jnp.float32)
        trainer.state = trainer.state.replace(params=params)
        trainer.logger.info("warm-started from %s", args.init_weights)
        pre = trainer.run_eval()
        trainer.logger.info("pre-finetune: %s", json.dumps(pre))

    trainer.run()
    post = trainer.run_eval()
    trainer.logger.info("post-finetune: %s", json.dumps(post))

    save_params_npz(args.save_weights, trainer.state.params,
                    dtype=jnp.bfloat16)
    trainer.logger.info("saved snapshot to %s", args.save_weights)
    print(json.dumps({"post": post, "snapshot": args.save_weights}))


if __name__ == "__main__":
    main()
