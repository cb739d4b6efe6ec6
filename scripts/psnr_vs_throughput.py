"""VERDICT r1 #3: the PSNR-vs-throughput tradeoff, measured.

Loads the convergence-run checkpoint (flagship trained on the synthetic
corpus), then for each inference variant:
  * full (exact reference semantics, 3 CG steps)
  * eval_cg_iters=2 / 1 (truncated unrolls)
measures (a) protocol PSNR on the held-out val set (seed-2204 noise,
uint8 PSNR), (b) single-chip throughput at 512² via the marginal method.
Variant PSNRs are deltas against the full model at the same weights.

Usage: python scripts/psnr_vs_throughput.py [--root experiments/convergence_tpu]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def marginal(fn, x, n0=3, n1=13, reps=3):
    def make(n):
        @jax.jit
        def chain(x):
            def bd(c, _):
                return fn(c), None
            z, _ = jax.lax.scan(bd, x, None, length=n)
            return z
        return chain
    out = []
    for c in (make(n0), make(n1)):
        c(x).block_until_ready()
        float(jnp.mean(c(x).astype(jnp.float32)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.mean(c(x).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        out.append(best)
    return (out[1] - out[0]) / (n1 - n0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="experiments/convergence_tpu")
    ap.add_argument("--model", default="flagship",
                    choices=["flagship", "lite", "micro", "pixel",
                             "restormer", "swinir", "drunet", "dncnn"])
    ap.add_argument("--val-root", default="experiments/convergence_tpu",
                    help="where val.csv/val_images live (shared corpus)")
    ap.add_argument("--sigma", type=float, default=25.0,
                    help="eval noise level (match the snapshot's training "
                         "sigma — e.g. flagship_synthetic_s15 at 15)")
    ap.add_argument("--filter-scales", default=None,
                    help="comma list of scales to keep filtering at "
                         "(e.g. '1,2,3' drops the scale-0 solve) — adds "
                         "variants measuring the eval_filter_scales "
                         "deployment knob on top of the cg sweep")
    ap.add_argument("--weights", default=None,
                    help="npz weight snapshot (utils/weights.py) to eval "
                         "instead of the orbax checkpoint — the committed "
                         "artifacts/weights/*.npz survive environment "
                         "resets; orbax experiment dirs do not")
    args = ap.parse_args()

    from irdu_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    from irdu_tpu.eval.harness import evaluate_pairs, load_benchmark_images
    from irdu_tpu.models.flagship import (
        AbstractMultiScaleGraphFilter,
        flagship_config,
        flagship_lite_config,
        flagship_micro_config,
    )
    from irdu_tpu.train.checkpoints import CheckpointManager
    from irdu_tpu.train.schedules import flagship_lr_schedule
    from irdu_tpu.train.steps import create_train_state

    BASELINES = {
        # identical constructions to run_convergence_tpu.py's baseline
        # branch (the benchmark-table training runs)
        "restormer": ("restormer", {"norm_type": "BiasFree"}),
        "drunet": ("drunet", {"in_nc": 3, "out_nc": 3}),
        "dncnn": ("dncnn", {"in_nc": 3, "out_nc": 3, "nc": 64, "nb": 17,
                            "act_mode": "R"}),
        "swinir": ("swinir", {}),
    }
    cfg = (None if args.model in ("pixel", *BASELINES) else
           {"flagship": flagship_config, "lite": flagship_lite_config,
            "micro": flagship_micro_config}[args.model]())
    def build(**variant_kw):
        if args.model in BASELINES:
            from irdu_tpu.models.registry import create_model

            kind, kw = BASELINES[args.model]
            return create_model(kind, **kw)
        if args.model == "pixel":
            # v6 reference scale; the fused solver measures slower for this
            # family at this scale (PERF.md), so the jnp default is the
            # deployment path. Fixed 4-iteration unroll — no cg knob.
            from irdu_tpu.models.pixel import MultiScaleSequenceDenoiser

            return MultiScaleSequenceDenoiser(
                n_graphs=24, n_node_fts=3, n_cnn_fts=72, window="diamond12")
        return AbstractMultiScaleGraphFilter(
            use_pallas_blocks=True, use_pallas_solver=True, **variant_kw,
            **cfg)

    if args.weights:
        from irdu_tpu.utils.weights import load_params_npz

        params = load_params_npz(args.weights, dtype=jnp.bfloat16)
        print(f"loaded weights from {args.weights}", flush=True)
    else:
        if args.model == "pixel":
            from irdu_tpu.models.pixel import MultiScaleSequenceDenoiser

            base = MultiScaleSequenceDenoiser(
                n_graphs=24, n_node_fts=3, n_cnn_fts=72, window="diamond12")
        else:
            base = AbstractMultiScaleGraphFilter(remat=True, **cfg)
        state = create_train_state(
            base, jax.random.PRNGKey(0),
            np.zeros((1, 64, 64, 3), np.float32), flagship_lr_schedule())
        cm = CheckpointManager(os.path.join(args.root, "checkpoints"))
        state, _ = cm.restore(state)
        print(f"loaded checkpoint at step {int(state.step)}", flush=True)
        params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                        state.params)

    if not os.path.exists(os.path.join(args.val_root, "val.csv")):
        # the synthetic corpus is deterministic (RandomState(42)) — rebuild
        # it so committed npz weights can be evaluated without re-training
        from run_convergence_tpu import build_corpus

        os.makedirs(args.val_root, exist_ok=True)
        build_corpus(args.val_root)
    images = load_benchmark_images(os.path.join(args.val_root, "val.csv"),
                                   os.path.join(args.val_root, "val_images"))
    xb = jnp.asarray(np.random.RandomState(0).rand(1, 512, 512, 3),
                     jnp.bfloat16)

    rows = []
    variants = [(None, None)] if args.model in ("pixel", *BASELINES) else [
        (3, None), (1, None)]  # cg2 measured == cg3 quality in r2 (free)
    if args.filter_scales and args.model not in ("pixel", *BASELINES):
        fs = tuple(int(s) for s in args.filter_scales.split(","))
        variants += [(3, fs), (1, fs)]
    for k, fs in variants:
        extra = {} if fs is None else {"eval_filter_scales": fs}
        model = (build(**extra) if k is None
                 else build(eval_cg_iters=k, **extra))
        fwd = jax.jit(lambda x, m=model: m.apply(params, x))
        out = evaluate_pairs(
            lambda x: np.asarray(fwd(jnp.asarray(x, jnp.bfloat16))
                                 .astype(jnp.float32)),
            images, sigma=args.sigma, bucket=64)
        t = marginal(lambda z, m=model: m.apply(params, z), xb)
        tag = args.model if k is None else f"{args.model}-cg{k}"
        if fs is not None:
            tag += "-fs" + "".join(str(s) for s in fs)
        rows.append({"variant": tag,
                     "psnr": out["mean_psnr"], "mp_per_s": 0.262144 / t})
        print(json.dumps(rows[-1]), flush=True)

    full = rows[0]["psnr"]
    for r in rows:
        r["psnr_delta_vs_full"] = r["psnr"] - full
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
