"""Widened natural benchmark: N>=20 held-out 64x64 crops (VERDICT r4 #5).

The whole-image natural benchmark is N=4 with ±2.2 dB per-image std, so
sub-1 dB cross-model deltas drown in noise. This protocol scores
per-crop over a deterministic 64-px grid of ALL held-out natural pixels
in this environment:

  * the 4 recovered figure panels (artifacts/natural_eval/images — the
    exploration/visual/img0{1..4}.png "True Image" panels), suspect-pixel
    masks inherited per crop;
  * the TWO held-out tiles of the reference's 0020.png (grid (1,1) and
    (2,3) of the 4x3 464x510 tiling — every OTHER tile appears in some
    training corpus: run_natural_finetune.py trains on the 10 remaining
    tiles and run_convergence_tpu --mix-natural mixes them in, so only
    these two are clean).

All crops share one 64² shape, so each model costs exactly one compiled
eval program, and every model sees the SAME seed-2204 noise stream
(evaluate_pairs draws noise sequentially over the fixed crop list) —
cross-model deltas are therefore PAIRED per crop, and the resolvability
criterion reported is |mean Δ| vs 2·SEM(per-crop Δ).

Protocol reference: README.ipynb cell 10 (seed-2204, uint8 PSNR);
crops keep the /16-safe 64² shape used by the in-training synval.

Usage (real TPU):
  python scripts/eval_natural_crops.py                 # sweep all snapshots
  python scripts/eval_natural_crops.py --weights artifacts/weights/X.npz --model flagship
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

CROP = 64
HELD_OUT_0020 = [(1, 1), (2, 3)]  # must match run_natural_finetune.py
REF_0020 = "/root/reference/exploration/GGTV_GGLR_v1.0/0020.png"


def build_crop_set(data_dir: str):
    """Deterministic 64² crop list: (crops, masks, sources)."""
    from PIL import Image

    if not os.path.exists(os.path.join(data_dir, "index.csv")):
        subprocess.run([sys.executable, "scripts/extract_natural_eval.py",
                        "--out", data_dir], check=True)

    crops, masks, sources = [], [], []

    def add_grid(img, mask, name):
        h, w = img.shape[:2]
        for r in range(h // CROP):
            for c in range(w // CROP):
                sl = np.s_[r * CROP:(r + 1) * CROP, c * CROP:(c + 1) * CROP]
                crops.append(img[sl])
                masks.append(mask[sl] if mask is not None else None)
                sources.append(f"{name}_r{r}c{c}")

    for i in (1, 2, 3, 4):
        img = np.asarray(Image.open(
            os.path.join(data_dir, "images", f"img{i:02d}_true.png")))
        mp = os.path.join(data_dir, "masks", f"img{i:02d}_suspect.png")
        mask = (np.asarray(Image.open(mp)) > 127) if os.path.exists(mp) else None
        add_grid(img, mask, f"img{i:02d}")

    if os.path.exists(REF_0020):
        img = np.asarray(Image.open(REF_0020).convert("RGB"))
        th, tw = 464, 510
        for (r, c) in HELD_OUT_0020:
            tile = img[r * th:(r + 1) * th, c * tw:(c + 1) * tw]
            add_grid(tile, None, f"0020_t{r}{c}")

    return crops, masks, sources


def main():
    import jax
    import jax.numpy as jnp

    from irdu_tpu.eval.harness import evaluate_pairs
    from irdu_tpu.utils.profiling import enable_compile_cache
    from irdu_tpu.utils.weights import load_params_npz

    from eval_natural_benchmark import SNAPSHOTS, build_model

    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="artifacts/natural_eval")
    ap.add_argument("--sigma", type=float, default=25.0)
    ap.add_argument("--model", default=None)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--snapshots", default=None,
                    help="comma list of snapshot basename substrings to "
                         "keep from the sweep (each distinct model costs "
                         "one compile — trim to the table models when "
                         "compile budget is tight)")
    args = ap.parse_args()

    enable_compile_cache()
    crops, masks, sources = build_crop_set(args.data)
    n = len(crops)
    from collections import Counter

    by_source = Counter("_".join(s.split("_")[:-1]) for s in sources)
    print(json.dumps({"n_crops": n, "by_source": dict(by_source)}), flush=True)

    noisy = evaluate_pairs(lambda x: x, crops, sigma=args.sigma,
                           bucket=CROP, masks=masks)
    rows = [{"snapshot": "noisy-input", "n": n,
             "psnr": round(noisy["mean_psnr"], 3),
             "masked_psnr": noisy.get("mean_masked_psnr")}]
    print(json.dumps(rows[0]), flush=True)

    todo = ([(args.model, args.weights)] if args.weights
            else [s for s in SNAPSHOTS if os.path.exists(s[1])])
    if args.snapshots and not args.weights:
        keys = args.snapshots.split(",")
        todo = [s for s in todo
                if any(k in os.path.basename(s[1]) for k in keys)]
    per_crop = {}
    for name, path in todo:
        model = build_model(name)
        params = load_params_npz(path, dtype=jnp.bfloat16)
        fwd = jax.jit(lambda p, x, m=model: m.apply(p, x))
        out = evaluate_pairs(
            lambda x: np.asarray(fwd(params, jnp.asarray(x, jnp.bfloat16))
                                 .astype(jnp.float32)),
            crops, sigma=args.sigma, bucket=CROP, masks=masks)
        arr = np.asarray(out["psnr"])
        per_crop[os.path.basename(path)] = arr
        row = {"snapshot": os.path.basename(path), "model": name, "n": n,
               "psnr": round(float(arr.mean()), 3),
               "psnr_std": round(float(arr.std()), 3),
               "psnr_sem": round(float(arr.std() / np.sqrt(n)), 3),
               "masked_psnr": out.get("mean_masked_psnr"),
               "per_crop": [round(float(p), 2) for p in arr]}
        rows.append(row)
        print(json.dumps({k: v for k, v in row.items() if k != "per_crop"}),
              flush=True)

    # paired resolvability: same crops + same noise stream for every model
    names = list(per_crop)
    pairs = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            d = per_crop[names[i]] - per_crop[names[j]]
            sem = float(d.std() / np.sqrt(n))
            pairs.append({"a": names[i], "b": names[j],
                          "delta": round(float(d.mean()), 3),
                          "sem": round(sem, 3),
                          "resolvable": bool(abs(d.mean()) > 2 * sem)})
    for p in pairs:
        print(json.dumps(p), flush=True)

    out_path = args.out or os.path.join(
        args.data, f"results_crops_sigma{args.sigma:g}.jsonl")
    mode = "a" if args.weights else "w"
    with open(out_path, mode) as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")
        if pairs:
            fh.write(json.dumps({"paired_deltas": pairs}) + "\n")
    print(f"wrote -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
