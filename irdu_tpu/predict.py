"""Single-command denoising CLI.

The reference's demo flow lives in a notebook (load checkpoint → seed-2204
noise → reflect-pad to /16 → forward → crop/clamp → save PNG;
/root/reference/exploration/GGTV_GGLR_v1.0/README.ipynb cells 10/12/16).
This makes it a first-class entry point against the committed portable
weight snapshots (utils/weights.py):

    # denoise an already-noisy image
    python -m irdu_tpu.predict --input noisy.png --output out.png

    # protocol mode: synthesize seed-2204 σ=25 noise from a clean image,
    # denoise, report uint8-domain PSNR (the benchmark convention)
    python -m irdu_tpu.predict --input clean.png --sigma 25 --output out.png

    # huge images: overlapping-tile inference bounds memory
    python -m irdu_tpu.predict --input 4k.png --tile 512 --output out.png
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_FAMILY = ("flagship", "lite", "micro", "pixel")


def build_model(name: str, *, fast: bool, cg_iters: int = 3,
                filter_scales=None):
    """One member of the trained family, inference-configured.

    fast=True enables the fused Pallas kernels — the TPU deployment path;
    on CPU they would run in interpret mode, so callers pass fast only on
    a TPU backend. The pixel family keeps the jnp path (measured faster
    for its 24-hypothesis v6 config — PERF.md)."""
    if name == "pixel":
        # The pixel family has no scale-pruning / CG-iteration knobs — its
        # solver is closed-form per level — so passing them is a config
        # error, not something to silently drop (ADVICE r3 #3).
        if filter_scales is not None or cg_iters != 3:
            raise ValueError(
                "--filter-scales/--cg-iters do not apply to the pixel "
                "model (closed-form per-level solver); remove them")
        from irdu_tpu.models.pixel import MultiScaleSequenceDenoiser

        return MultiScaleSequenceDenoiser(
            n_graphs=24, n_node_fts=3, n_cnn_fts=72, window="diamond12")

    from irdu_tpu.models.flagship import (
        AbstractMultiScaleGraphFilter,
        flagship_config,
        flagship_lite_config,
        flagship_micro_config,
    )

    cfg = {"flagship": flagship_config, "lite": flagship_lite_config,
           "micro": flagship_micro_config}[name]()
    extra = ({} if filter_scales is None
             else {"eval_filter_scales": tuple(filter_scales)})
    return AbstractMultiScaleGraphFilter(
        use_pallas_blocks=fast, use_pallas_solver=fast,
        eval_cg_iters=cg_iters, **extra, **cfg)


def default_weights(name: str) -> str | None:
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "weights")
    if not os.path.isdir(root):
        return None
    cands = sorted(f for f in os.listdir(root)
                   if f.startswith(f"{name}_") and f.endswith(".npz"))
    return os.path.join(root, cands[-1]) if cands else None


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="python -m irdu_tpu.predict", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--input", required=True, help="input PNG/JPEG")
    ap.add_argument("--output", required=True, help="denoised PNG path")
    ap.add_argument("--model", default="flagship", choices=_FAMILY)
    ap.add_argument("--weights", default=None,
                    help="npz snapshot (default: newest "
                         "artifacts/weights/<model>_*.npz)")
    ap.add_argument("--sigma", type=float, default=None,
                    help="treat --input as CLEAN: add N(0, σ/255) noise "
                         "(benchmark protocol) and report PSNR")
    ap.add_argument("--seed", type=int, default=2204,
                    help="noise seed for --sigma mode (protocol: 2204)")
    ap.add_argument("--clean", default=None,
                    help="clean reference image for PSNR reporting when "
                         "--input is already noisy")
    ap.add_argument("--cg-iters", type=int, default=3,
                    help="solver unroll length (3 = exact reference "
                         "semantics; 1 trades ≤0.01 dB for ~16%% speed)")
    ap.add_argument("--tile", type=int, default=0,
                    help=">0: overlapping-tile inference (tile size px) "
                         "for images too large for one pass")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from irdu_tpu.eval.metrics import img_as_ubyte, psnr_255
    from irdu_tpu.utils.weights import load_params_npz

    weights = args.weights or default_weights(args.model)
    if weights is None:
        sys.exit(f"no weight snapshot found for {args.model!r}; "
                 f"pass --weights or train one (scripts/run_convergence_tpu.py)")

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = build_model(args.model, fast=on_tpu, cg_iters=args.cg_iters)
    params = load_params_npz(weights, dtype=dtype)

    clean_255 = None
    img = np.asarray(Image.open(args.input).convert("RGB"), np.float32)
    if args.sigma is not None:
        clean_255 = img
        rs = np.random.RandomState(args.seed)
        noisy = img / 255.0 + rs.normal(0, args.sigma / 255.0, img.shape)
    else:
        noisy = img / 255.0
        if args.clean:
            clean_255 = np.asarray(
                Image.open(args.clean).convert("RGB"), np.float32)
    noisy = noisy.astype(np.float32)

    fwd = jax.jit(lambda x: model.apply(params, x).astype(jnp.float32))

    def forward_np(batch: np.ndarray) -> np.ndarray:
        return np.asarray(fwd(jnp.asarray(batch, dtype)))

    if args.tile:
        from irdu_tpu.parallel.spatial import tiled_forward

        t0 = time.perf_counter()
        restored = tiled_forward(forward_np, noisy, tile=args.tile, halo=64)
        dt = time.perf_counter() - t0
    else:
        h, w = noisy.shape[:2]
        ph, pw = (-h) % 16, (-w) % 16
        pad = np.pad(noisy, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        forward_np(pad[None])  # compile + warmup: report steady-state time
        t0 = time.perf_counter()
        restored = forward_np(pad[None])[0, :h, :w]
        dt = time.perf_counter() - t0

    out_u8 = img_as_ubyte(np.clip(restored, 0.0, 1.0))
    Image.fromarray(out_u8).save(args.output)

    report = {
        "model": args.model, "weights": os.path.basename(weights),
        "shape": list(img.shape[:2]), "seconds": round(dt, 3),
        "megapixels_per_s": round(img.shape[0] * img.shape[1] / dt / 1e6, 3),
        "output": args.output,
    }
    if clean_255 is not None:
        report["psnr_noisy"] = round(psnr_255(
            clean_255, img_as_ubyte(np.clip(noisy, 0, 1)).astype(np.float32)), 3)
        report["psnr_denoised"] = round(
            psnr_255(clean_255, out_u8.astype(np.float32)), 3)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
