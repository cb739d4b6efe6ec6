"""Score committed weight snapshots on the held-out NATURAL eval set.

The set (artifacts/natural_eval/, built by scripts/extract_natural_eval.py)
is four genuine Kodak-style photographs recovered from the reference's
qualitative figure panels — pixels that appear in NO training corpus here
(the natural fine-tune trains only on 0020.png tiles). Protocol matches
the reference benchmark loop (seed-2204 noise, /16 reflect pad, uint8
PSNR — SURVEY §1 L7; ref scripts_v2/run_abtract_lightformer_GGTV_GGLR_
sigma25.py:235-343).

Usage (real TPU):
  python scripts/eval_natural_benchmark.py            # all snapshots
  python scripts/eval_natural_benchmark.py --weights artifacts/weights/flagship_natural_ft.npz --model flagship
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

SNAPSHOTS = [
    ("flagship", "artifacts/weights/flagship_synthetic_2050.npz"),
    ("flagship", "artifacts/weights/flagship_ext_6050.npz"),
    ("flagship", "artifacts/weights/flagship_50k_51000.npz"),
    ("flagship", "artifacts/weights/flagship_natural_ft.npz"),
    ("lite", "artifacts/weights/lite_synthetic_2050.npz"),
    ("micro", "artifacts/weights/micro_synthetic_2050.npz"),
    ("micro", "artifacts/weights/micro_distill03_2050.npz"),
    ("pixel", "artifacts/weights/pixel_synthetic_2050.npz"),
    ("boosting", "artifacts/weights/boosting_synthetic_2050.npz"),
    # benchmark-table baselines, trained under the identical 2050-step
    # budget/corpus (VERDICT r3 #1)
    ("drunet", "artifacts/weights/drunet_synthetic_2050.npz"),
    ("dncnn", "artifacts/weights/dncnn_synthetic_2050.npz"),
    ("restormer", "artifacts/weights/restormer_synthetic_2050.npz"),
    ("swinir", "artifacts/weights/swinir_synthetic_2050.npz"),
    # round-5 additions (skipped until the snapshots exist)
    ("flagship", "artifacts/weights/flagship_cont100k_35000.npz"),
]

# identical constructions to run_convergence_tpu.py's baseline branch
BASELINES = {
    "restormer": ("restormer", {"norm_type": "BiasFree"}),
    "drunet": ("drunet", {"in_nc": 3, "out_nc": 3}),
    "dncnn": ("dncnn", {"in_nc": 3, "out_nc": 3, "nc": 64, "nb": 17,
                        "act_mode": "R"}),
    "swinir": ("swinir", {}),
}


def build_model(name: str):
    if name in BASELINES:
        from irdu_tpu.models.registry import create_model

        kind, kw = BASELINES[name]
        return create_model(kind, **kw)
    if name == "pixel":
        from irdu_tpu.models.pixel import MultiScaleSequenceDenoiser

        return MultiScaleSequenceDenoiser(
            n_graphs=24, n_node_fts=3, n_cnn_fts=72, window="diamond12")
    if name == "boosting":
        from irdu_tpu.models.glr_boosting import GLRBoostingPyramid

        return GLRBoostingPyramid()
    from irdu_tpu.models.flagship import (
        AbstractMultiScaleGraphFilter,
        flagship_config,
        flagship_lite_config,
        flagship_micro_config,
    )

    cfg = {"flagship": flagship_config, "lite": flagship_lite_config,
           "micro": flagship_micro_config}[name]()
    return AbstractMultiScaleGraphFilter(
        use_pallas_blocks=True, use_pallas_solver=True, **cfg)


def main():
    import jax
    import jax.numpy as jnp

    from irdu_tpu.eval.harness import evaluate_pairs, load_benchmark_images
    from irdu_tpu.utils.profiling import enable_compile_cache
    from irdu_tpu.utils.weights import load_params_npz

    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="artifacts/natural_eval")
    ap.add_argument("--sigma", type=float, default=25.0)
    ap.add_argument("--bucket", type=int, default=64)
    ap.add_argument("--model", default=None)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--out", default=None,
                    help="jsonl to write (full sweep rewrites it so every "
                         "row carries the masked metric; a single "
                         "--weights run appends one row). Default: "
                         "<data>/results_sigma{sigma:g}.jsonl for the "
                         "full sweep, no file for single runs.")
    args = ap.parse_args()

    enable_compile_cache()
    if not os.path.exists(os.path.join(args.data, "index.csv")):
        subprocess.run([sys.executable, "scripts/extract_natural_eval.py",
                        "--out", args.data], check=True)
    images = load_benchmark_images(os.path.join(args.data, "index.csv"),
                                   os.path.join(args.data, "images"))
    # suspect-pixel masks (annotation-halo contamination bound, VERDICT r2
    # #10): metrics are reported with AND without the suspect pixels; the
    # difference bounds any overlay contamination of the recovered panels.
    masks = None
    mask_dir = os.path.join(args.data, "masks")
    if os.path.isdir(mask_dir):
        from PIL import Image

        import csv as _csv
        with open(os.path.join(args.data, "index.csv"), newline="") as fh:
            names = [os.path.splitext(os.path.basename(r["path"]))[0]
                     for r in _csv.DictReader(fh)]
        masks = []
        for stem in names:
            p = os.path.join(mask_dir, stem.replace("_true", "_suspect") + ".png")
            masks.append(np.asarray(Image.open(p)) > 127 if os.path.exists(p)
                         else None)
    noisy = evaluate_pairs(lambda x: x, images, sigma=args.sigma,
                           bucket=args.bucket, masks=masks)
    noisy_psnr = noisy["mean_psnr"]
    print(json.dumps({"snapshot": "noisy-input", "psnr": noisy_psnr,
                      "masked_psnr": noisy.get("mean_masked_psnr")}),
          flush=True)

    todo = ([(args.model, args.weights)] if args.weights
            else [s for s in SNAPSHOTS if os.path.exists(s[1])])
    results = []
    for name, path in todo:
        model = build_model(name)
        params = load_params_npz(path, dtype=jnp.bfloat16)
        # params as a traced argument, NOT a closure constant: constants bloat
        # the HLO (13M-param models) and defeat compile-cache reuse between
        # snapshots of the same family (flagship appears twice in SNAPSHOTS).
        fwd = jax.jit(lambda p, x, m=model: m.apply(p, x))
        out = evaluate_pairs(
            lambda x: np.asarray(fwd(params, jnp.asarray(x, jnp.bfloat16))
                                 .astype(jnp.float32)),
            images, sigma=args.sigma, bucket=args.bucket, masks=masks)
        row = {"snapshot": os.path.basename(path), "model": name,
               "psnr": out["mean_psnr"],
               "psnr_std": float(np.std(out["psnr"])),
               "masked_psnr": out.get("mean_masked_psnr"),
               "per_image": [round(p, 3) for p in out["psnr"]]}
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"sigma": args.sigma, "noisy": noisy_psnr,
                      "results": results}))

    out_path = args.out
    if out_path is None and not args.weights:
        out_path = os.path.join(args.data,
                                f"results_sigma{args.sigma:g}.jsonl")
    if out_path:
        mode = "a" if args.weights else "w"
        with open(out_path, mode) as fh:
            if mode == "w":
                fh.write(json.dumps(
                    {"snapshot": "noisy-input", "psnr": noisy_psnr,
                     "masked_psnr": noisy.get("mean_masked_psnr")}) + "\n")
            for row in results:
                fh.write(json.dumps(row) + "\n")
        print(f"wrote {len(results)} row(s) -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
