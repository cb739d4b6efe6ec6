"""VERDICT r1 #4: prove the flagship trainer converges on the real TPU —
full 13.28M model, multi-stage progressive patch schedule, periodic
benchmark-protocol eval on held-out images, checkpoint + resume.

No real dataset is available in this environment (zero egress), so the
corpus is the synthetic piecewise-smooth class the graph prior targets
(data/synthetic.py). The point is the trainer/optimizer/schedule/eval
machinery converging on real hardware, not SOTA PSNR.

Usage: python scripts/run_convergence_tpu.py [--extra-steps N]
Run once to train; run again to exercise auto-resume (+N steps).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_corpus(root: str, extra_train: int = 0):
    """Deterministic synthetic corpus. The base 24-train/6-val draw from
    RandomState(42) is bit-stable (committed npz weights are evaluated
    against this exact val set); `extra_train` appends additional train
    images from an independent RandomState(142) stream so longer runs see
    more data WITHOUT perturbing the base draw or the val set."""
    from PIL import Image

    from irdu_tpu.data.dataset import build_image_index
    from irdu_tpu.data.synthetic import make_synthetic_image

    train_dir = os.path.join(root, "train_images")
    val_dir = os.path.join(root, "val_images")
    if not os.path.exists(os.path.join(root, "train.csv")):
        os.makedirs(train_dir, exist_ok=True)
        os.makedirs(val_dir, exist_ok=True)
        rng = np.random.RandomState(42)
        for i in range(24):
            h = int(rng.randint(420, 520))
            w = int(rng.randint(420, 520))
            Image.fromarray(make_synthetic_image(rng, h, w)).save(
                os.path.join(train_dir, f"t{i:03d}.png"))
        for i in range(6):  # one eval shape -> one compiled eval program
            Image.fromarray(make_synthetic_image(rng, 384, 512)).save(
                os.path.join(val_dir, f"v{i:03d}.png"))
        build_image_index(val_dir, os.path.join(root, "val.csv"))
        build_image_index(train_dir, os.path.join(root, "train.csv"))
    if extra_train and not os.path.exists(
            os.path.join(train_dir, f"x{extra_train - 1:03d}.png")):
        rng = np.random.RandomState(142)
        for i in range(extra_train):
            h = int(rng.randint(420, 520))
            w = int(rng.randint(420, 520))
            Image.fromarray(make_synthetic_image(rng, h, w)).save(
                os.path.join(train_dir, f"x{i:03d}.png"))
        build_image_index(train_dir, os.path.join(root, "train.csv"))


def mix_natural_tiles(root: str) -> None:
    """Add the 10 natural train tiles (0020.png 4x3 grid minus the 2
    held-out tiles of run_natural_finetune.py) to the train corpus, so a
    long run trains on a synthetic + natural mix. The natural VAL tiles
    are never added — the held-out natural protocol stays clean."""
    from PIL import Image

    from irdu_tpu.data.dataset import build_image_index

    ref_image = "/root/reference/exploration/GGTV_GGLR_v1.0/0020.png"
    val_tiles = {(1, 1), (2, 3)}
    train_dir = os.path.join(root, "train_images")
    marker = os.path.join(train_dir, "nat_r0c0.png")
    if os.path.exists(marker) or not os.path.exists(ref_image):
        return
    img = np.asarray(Image.open(ref_image).convert("RGB"))
    th, tw = 464, 510
    for r in range(img.shape[0] // th):
        for c in range(img.shape[1] // tw):
            if (r, c) in val_tiles:
                continue
            tile = img[r * th:(r + 1) * th, c * tw:(c + 1) * tw]
            Image.fromarray(tile).save(
                os.path.join(train_dir, f"nat_r{r}c{c}.png"))
    build_image_index(train_dir, os.path.join(root, "train.csv"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--extra-steps", type=int, default=0)
    ap.add_argument("--stage-steps", default=None,
                    help="comma list of per-stage step counts for the "
                         "flagship-family 4-stage schedule (default "
                         "1200,400,300,150); max_steps becomes the sum — "
                         "use for real-budget runs, e.g. "
                         "45000,2000,2000,2000 for the >=50k run that "
                         "exercises the reference LR schedule's first "
                         "multistep milestone (VERDICT r2 #1)")
    ap.add_argument("--stage1-no-remat", action="store_true",
                    help="run the 128^2 stage without per-block remat "
                         "(fits 16 GB HBM; ~3.5x the step rate) — the "
                         "192^2+ stages keep remat (they OOM without it)")
    ap.add_argument("--mix-natural", action="store_true",
                    help="mix the 10 natural 0020.png train tiles into "
                         "the corpus (held-out natural tiles excluded)")
    ap.add_argument("--eval-rate", type=int, default=500)
    ap.add_argument("--ckpt-rate", type=int, default=500)
    ap.add_argument("--schedule", default="reference",
                    choices=["reference", "scaled"],
                    help="'reference' = the verbatim flagship LR scheme "
                         "(first decay at 50k — effectively constant 4e-4 "
                         "for short runs); 'scaled' = the same MultiStep-"
                         "then-cosine shape compressed to this run's "
                         "horizon, so a few-thousand-step run actually "
                         "anneals (scripts_v2/...sigma25.py:146-163 shape)")
    ap.add_argument("--root", default="experiments/convergence_tpu")
    ap.add_argument("--extra-train-images", type=int, default=0,
                    help="append N extra synthetic train images (separate "
                         "deterministic stream; base corpus + val set stay "
                         "bit-identical) — use for longer runs so the small "
                         "24-image base corpus doesn't overfit")
    ap.add_argument("--distill-from", default=None,
                    help="npz weight snapshot of a trained FLAGSHIP to use "
                         "as a frozen distillation teacher (adds "
                         "L1(student, teacher(noisy)) to the loss; the "
                         "teacher runs the bf16 fast path inside the same "
                         "jitted step)")
    ap.add_argument("--distill-weight", type=float, default=1.0)
    ap.add_argument("--tag", default=None,
                    help="suffix for the exported npz (defaults to "
                         "'distill' when --distill-from is set)")
    ap.add_argument("--model", default="flagship",
                    choices=["flagship", "lite", "micro", "pixel", "boosting",
                             "restormer", "swinir", "drunet", "dncnn"],
                    help="member of the family to train (the lite/micro "
                         "FLOP-reduced configs feed the PSNR-vs-MP/s curve; "
                         "pixel = the v6 MultiScaleSequenceDenoiser lineage; "
                         "boosting = the multiscale GLR boosting pyramid, "
                         "BASELINE.json config #2; restormer/drunet/dncnn = "
                         "the baseline zoo, trained under the identical "
                         "budget/corpus for the cross-model benchmark table "
                         "— the capability of the reference's missing "
                         "2008-evaluate-models.ipynb and its "
                         "run_REstormer_sigma25.py comparison)")
    ap.add_argument("--sigma", type=float, default=25.0,
                    help="Gaussian noise level for the fixed-sigma "
                         "(flagship-family) runs — the reference ships "
                         "sigma 15/25/50 trainers (scripts_v2/run_abtract_"
                         "lightformer_GGTV_GGLR_sigma{15,25,50}.py); the "
                         "eval protocol uses the same sigma. Ignored by "
                         "the vary-noise pixel/boosting runs.")
    ap.add_argument("--lr-step-offset", type=int, default=0,
                    help="shift the LR scheme by N steps — use with "
                         "--init-weights to CONTINUE a step-N run's "
                         "reference LR trajectory after an environment "
                         "reset killed its orbax state (e.g. 51000 to "
                         "resume the 51k flagship past the first "
                         "x0.5^0.25 milestone)")
    ap.add_argument("--init-weights", default=None,
                    help="npz snapshot to warm-start from at step 0 (an "
                         "orbax resume, if present, wins over this) — use "
                         "with --extra-steps + --schedule scaled to extend "
                         "a committed 2050-step run past an environment "
                         "reset that killed its orbax checkpoints")
    args = ap.parse_args()
    if args.model != "flagship" and args.root == "experiments/convergence_tpu":
        args.root = f"experiments/convergence_{args.model}"
    if args.distill_from and args.root.startswith("experiments/convergence"):
        args.root += "_distill"
    fixed_sigma = args.model in ("flagship", "lite", "micro",
                                 "restormer", "swinir", "drunet", "dncnn")
    if (fixed_sigma and args.sigma != 25.0
            and args.root.startswith("experiments/convergence")):
        # keep each noise level's orbax state separate so auto-resume
        # never crosses sigmas
        args.root += f"_s{args.sigma:g}"

    os.makedirs(args.root, exist_ok=True)
    build_corpus(args.root, extra_train=args.extra_train_images)
    if args.mix_natural:
        mix_natural_tiles(args.root)

    from irdu_tpu.models.flagship import (
        flagship_config,
        flagship_lite_config,
        flagship_micro_config,
    )
    from irdu_tpu.train.trainer import Trainer

    max_steps = 2050 + args.extra_steps
    if args.model == "boosting":
        # BASELINE.json config #2: the multiscale-GLR-boosting pyramid
        # reconstructed from the 2002 notebook (models/glr_boosting.py;
        # upstream model_MMGLR module is missing from the reference).
        # Notebook config: 5 graphs, 4 levels, 5 CG iters, per-level μ
        # halving 0.3→0.0375; trained at 128² patches, vary-noise.
        model_conf = {
            "type": "glr_boosting_pyramid",
            "n_graphs": 5,
            "n_levels": 4,
            "n_cgd_iters": 5,
            "nchannels_abstract": 12,
            "muy_init": [0.3, 0.15, 0.075, 0.0375],
            "node_fts": [12, 12, 24, 48],
            "level_features": [60, 60, 120, 240],
        }
        dist_mode = "vary_addictive_noise"
        lambda_noise = [[1.0, 10.0, 15.0, 20.0, 25.0],
                        [0.1, 0.1, 0.1, 0.1, 0.6]]
        use_aux = False
        stages = [
            {"patch_size": 128, "batch_size": 8,
             "max_num_patchs": 8 * max_steps},
        ]
        schedule = {"type": "multistep", "base_lr": 4.0e-4,
                    "milestones": [600, 1500, 1900], "gamma": 0.5}
    elif args.model == "pixel":
        # the v6 pixel-domain lineage at its reference scale (24 graphs ×
        # 3 node-fts, diamond12, 4 CG — scripts/run_lightformer_GGTV_GGLR_
        # sigma25.py:117-120 uses vary_addictive_noise); no encode/decode
        # API, so the flagship aux losses are off.
        model_conf = {
            "type": "multiscale_sequence_denoiser",
            "n_graphs": 24,
            "n_node_fts": 3,
            "n_cnn_fts": 72,
            "window": "diamond12",
            "remat": True,
        }
        dist_mode = "vary_addictive_noise"
        lambda_noise = [[1.0, 10.0, 15.0, 20.0, 25.0],
                        [0.1, 0.1, 0.1, 0.1, 0.6]]
        use_aux = False
        # the reference pixel trainer's 64/128/256/512 progression, scaled
        # to the same 2050 steps/epoch as the flagship runs
        stages = [
            {"patch_size": 64, "batch_size": 16, "max_num_patchs": 19200},
            {"patch_size": 128, "batch_size": 4, "max_num_patchs": 1600},
            {"patch_size": 256, "batch_size": 2, "max_num_patchs": 600},
            {"patch_size": 512, "batch_size": 1, "max_num_patchs": 150},
        ]
        schedule = {"type": "multistep", "base_lr": 4.0e-4,
                    "milestones": [600, 1500, 1900], "gamma": 0.5}
    else:
        if args.model in ("restormer", "swinir", "drunet", "dncnn"):
            # The baseline zoo under the IDENTICAL training budget/corpus/
            # schedule as the flagship family — feeds the cross-model
            # benchmark table (VERDICT r2 #2; ref run_REstormer_sigma25.py:
            # 118-129 for the Restormer config: dim 48, blocks [4,6,6,8],
            # BiasFree norm). DRUNet = UNetRes(3→3, 64-512, nb=4); DnCNN
            # uses act_mode "R" (no BN — the trainer state is params-only;
            # the BN variant exists and is parity-tested, test_drunet_family).
            model_conf = {
                "restormer": {"type": "restormer", "norm_type": "BiasFree",
                              "remat": True},
                # the reference's SwinIR eval config (baselineSwinSR.py:618
                # instantiated in 2007-GGTV-GGLR-explore.ipynb cell 46):
                # depths 6x[6], embed 180, heads 6, window 8, mlp 2; never
                # trained upstream -- trained here at the shared table
                # budget (VERDICT r4 #3)
                "swinir": {"type": "swinir", "remat": True},
                "drunet": {"type": "drunet", "in_nc": 3, "out_nc": 3},
                "dncnn": {"type": "dncnn", "in_nc": 3, "out_nc": 3,
                          "nc": 64, "nb": 17, "act_mode": "R"},
            }[args.model]
        else:
            mc = {"flagship": flagship_config, "lite": flagship_lite_config,
                  "micro": flagship_micro_config}[args.model]()
            model_conf = {
                "type": "abstract_multiscale_graph_filter",
                "dims": list(mc["dims"]),
                "hidden_dims": list(mc["hidden_dims"]),
                "ngraphs": list(mc["ngraphs"]),
                "num_blocks": list(mc["num_blocks"]),
                "num_blocks_out": mc["num_blocks_out"],
                "remat": True,
            }
        dist_mode = "addictive_noise_scale"
        lambda_noise = float(args.sigma)
        # the 3-term aux loss needs the encode/decode API (flagship family
        # only); baselines train on plain L1
        use_aux = args.model not in ("restormer", "swinir", "drunet", "dncnn")
        counts = [1200, 400, 300, 150]
        if args.stage_steps:
            counts = [int(x) for x in args.stage_steps.split(",")]
            max_steps = sum(counts) + args.extra_steps
        stages = [
            {"patch_size": p, "batch_size": b, "max_num_patchs": b * n}
            for (p, b, n) in zip([128, 192, 256, 384], [4, 3, 2, 1], counts)
            if n > 0
        ]
        if args.stage1_no_remat and stages and stages[0]["patch_size"] == 128:
            stages[0]["remat"] = False
        if args.schedule == "scaled":
            # the reference scheme (4e-4, ×0.5^0.25 every 50k to 600k, then
            # cosine 5e-5→1e-6 over 701k of an ~820k-iter run) compressed by
            # s = max_steps/820k so the run ends annealed rather than at the
            # constant head of the schedule
            s = max_steps / 820000.0
            schedule = {
                "type": "multistep_then_cosine",
                "base_lr": 4.0e-4,
                "milestones": [max(1, round(50000 * i * s)) for i in range(1, 13)],
                "gamma": float(np.sqrt(np.sqrt(0.5))),
                "switch_step": max(1, round(600000 * s)),
                "cosine_base_lr": 5.0e-5,
                "cosine_t_max": max(1, round(701000 * s)),
                "eta_min": 1.0e-6,
            }
        else:
            schedule = {"type": "flagship"}
    if args.lr_step_offset:
        schedule = dict(schedule, step_offset=args.lr_step_offset)
    config = {
        "name": os.path.basename(args.root),
        "task": "denoise",
        "manual_seed": 2204,
        "path": {"root_dir": "experiments"},
        "model": model_conf,
        "parallel": {"data_parallel": 1},
        "datasets": {
            "train": {
                "csv_path": os.path.join(args.root, "train.csv"),
                "root_folder": os.path.join(args.root, "train_images"),
                "dist_mode": dist_mode,
                "lambda_noise": lambda_noise,
                "use_data_aug": True,
                "seed": 2204,
            }
        },
        "eval": {
            "sigma": float(args.sigma) if fixed_sigma else 25.0,
            "bucket": 64,
            "datasets": {
                "synval": {
                    "csv_path": os.path.join(args.root, "val.csv"),
                    "root_folder": os.path.join(args.root, "val_images"),
                },
            },
        },
        "train": {
            "num_epochs": 4,
            # the reference's progressive-patch schedule
            # (scripts_v2/...sigma25.py:50-115), scaled to this corpus
            "stages": stages,
            "schedule": schedule,
            "use_aux_losses": use_aux,
            "verbose_rate": 50,
            "checkpoint_rate": args.ckpt_rate,
            "eval_rate": args.eval_rate,
            "max_steps": max_steps,
        },
    }
    if args.distill_from:
        tmc = flagship_config()
        config["train"]["distill"] = {
            "model": {
                "type": "abstract_multiscale_graph_filter",
                "dims": list(tmc["dims"]),
                "hidden_dims": list(tmc["hidden_dims"]),
                "ngraphs": list(tmc["ngraphs"]),
                "num_blocks": list(tmc["num_blocks"]),
                "num_blocks_out": tmc["num_blocks_out"],
                # inference-only teacher: ride the fused bf16 kernels
                "use_pallas_blocks": True,
                "use_pallas_solver": True,
            },
            "weights": args.distill_from,
            "weight": args.distill_weight,
            "dtype": "bfloat16",
        }
    import jax
    import jax.numpy as jnp

    from irdu_tpu.utils.weights import save_params_npz

    trainer = Trainer(config)
    if args.init_weights and int(trainer.state.step) == 0:
        from irdu_tpu.utils.weights import load_params_npz

        trainer.state = trainer.state.replace(
            params=load_params_npz(args.init_weights, dtype=jnp.float32))
        trainer.logger.info("warm-started from %s", args.init_weights)
    out = trainer.run()

    # portable trained-weights artifact (utils/weights.py): bf16 npz small
    # enough to commit, so the trained model survives environment resets

    tag = args.tag or ("distill" if args.distill_from else "synthetic")
    if fixed_sigma and args.sigma != 25.0 and args.tag is None:
        tag += f"_s{args.sigma:g}"
    export = os.path.join("artifacts", "weights",
                          f"{args.model}_{tag}_{out['step']}.npz")
    os.makedirs(os.path.dirname(export), exist_ok=True)
    save_params_npz(export, jax.device_get(trainer.state.params),
                    dtype=jnp.bfloat16)
    print("DONE", out, "weights ->", export)


if __name__ == "__main__":
    main()
