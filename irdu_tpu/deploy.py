"""Ahead-of-time export for serving: serialize the jitted forward as a
portable StableHLO artifact (`jax.export`), reload it without any model
code, and run it.

The reference has no deployment story beyond "load the .pt in a notebook"
(/root/reference/exploration/GGTV_GGLR_v1.0/README.ipynb cell 3). Here the
deployable unit is a self-contained serialized program: weights are baked
in as constants, shapes/dtypes are pinned, and the consumer needs only
jax — no flax module tree, no irdu_tpu import. This is the TPU-native
analogue of a TorchScript/ONNX export.

Notes
-----
* Exports are platform-tagged: a program exported on the TPU backend
  (including its Mosaic/Pallas custom calls) reloads on TPU; export on CPU
  for a CPU-servable artifact. `load_exported` checks the tag up front so
  a mismatch fails with a clear message instead of an XLA error.
* Static shapes by design (XLA semantics): one artifact per (batch, H, W)
  bucket, mirroring the eval pipeline's pad-to-bucket batching. Serving
  arbitrary sizes = reflect-pad to the nearest bucket, run, crop — exactly
  the benchmark protocol (eval/harness.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

__all__ = ["export_forward", "load_exported"]

_MAGIC = b"IRDU1"


def export_forward(apply_fn, params, batch: int, height: int, width: int,
                   *, dtype=jnp.bfloat16, path: str | None = None,
                   pointwise_int8: bool = False) -> bytes:
    """Export `apply_fn(params, x)` with `params` baked in, for input
    shape (batch, height, width, 3) of `dtype`. Returns the serialized
    bytes (and writes them to `path` if given).

    pointwise_int8: bake every 2-D (1×1) kernel as int8 constants + a
    per-output-channel dequant multiply INSIDE the program — the
    serialized artifact then carries int8 payloads (~4× smaller for the
    pointwise-dominated flagship) at measured-zero quality cost
    (PERF.md round-4 deployment levers)."""
    if height % 16 or width % 16:
        raise ValueError("export shapes must be /16 (the model's resample "
                         f"factor); got {height}x{width}")
    if pointwise_int8:
        from irdu_tpu.utils.weights import (
            dequantize_pointwise,
            quantize_pointwise_int8,
        )

        qtree = quantize_pointwise_int8(params)

        def cast_rest(node):
            # non-quantized leaves ride at `dtype` so the artifact doesn't
            # carry f32 constants; {__q8__, __q8scale__} markers stay put
            if isinstance(node, dict):
                if "__q8__" in node:
                    return node
                return {k: cast_rest(v) for k, v in node.items()}
            return np.asarray(node, dtype)

        qtree = cast_rest(qtree)

        def fwd(x):
            p = dequantize_pointwise(qtree, dtype=dtype, asarray=jnp.asarray)
            return apply_fn(p, x)
    else:
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), params)

        def fwd(x):
            return apply_fn(params, x)

    spec = jax.ShapeDtypeStruct((batch, height, width, 3), dtype)
    exported = jax_export.export(jax.jit(fwd))(spec)
    blob = _MAGIC + exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(blob_or_path):
    """Deserialize an export_forward artifact -> callable(x) -> denoised.

    Accepts the raw bytes or a file path. Raises if the artifact's
    platform tag doesn't match the current default backend."""
    if isinstance(blob_or_path, str):
        with open(blob_or_path, "rb") as f:
            blob = f.read()
    else:
        blob = bytes(blob_or_path)
    if blob[:5] != _MAGIC:
        raise ValueError("not an irdu_tpu export artifact")
    exported = jax_export.deserialize(blob[5:])
    backend = jax.default_backend()
    plats = [p.lower() for p in exported.platforms]
    if backend.lower() not in plats:
        raise ValueError(
            f"artifact was exported for {exported.platforms}, but the "
            f"current backend is {backend!r}; re-export on this platform")

    (in_spec,) = exported.in_avals

    def run(x):
        x = jnp.asarray(x, in_spec.dtype)
        if x.shape != in_spec.shape:
            raise ValueError(f"expected input {in_spec.shape}, got {x.shape}")
        return exported.call(x)

    run.input_shape = tuple(in_spec.shape)
    run.input_dtype = np.dtype(in_spec.dtype)
    return run


def main(argv=None):
    """CLI: bake a trained weight snapshot into a servable artifact.

        python -m irdu_tpu.deploy --model flagship --size 512 \
            --output flagship_512.irdu [--batch 1] [--cg-iters 3]

    Exports for the CURRENT backend (TPU under jit on the chip; CPU when
    forced) at one static (batch, size, size) bucket — the serving recipe
    is reflect-pad to bucket, run, crop (eval/harness.py protocol)."""
    import argparse
    import json

    ap = argparse.ArgumentParser(prog="python -m irdu_tpu.deploy",
                                 description=main.__doc__)
    ap.add_argument("--model", default="flagship",
                    choices=("flagship", "lite", "micro", "pixel"))
    ap.add_argument("--weights", default=None,
                    help="npz snapshot (default: newest "
                         "artifacts/weights/<model>_*.npz)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--size", type=int, default=512,
                    help="square input bucket (px, /16)")
    ap.add_argument("--cg-iters", type=int, default=3)
    ap.add_argument("--filter-scales", default=None,
                    help="comma list of scales to keep graph filtering at "
                         "(deployment FLOP knob; default all four)")
    ap.add_argument("--weight-int8", action="store_true",
                    help="bake 1x1 kernels as int8 + dequant into the "
                         "artifact (~4x smaller; measured quality-free on "
                         "the 51k flagship — PERF.md round-4)")
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    from irdu_tpu.predict import build_model, default_weights
    from irdu_tpu.utils.weights import load_params_npz

    weights = args.weights or default_weights(args.model)
    if weights is None:
        raise SystemExit(f"no weight snapshot found for {args.model!r}")
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    fs = (None if args.filter_scales is None
          else tuple(int(s) for s in args.filter_scales.split(",")))
    model = build_model(args.model, fast=on_tpu, cg_iters=args.cg_iters,
                        filter_scales=fs)
    params = load_params_npz(weights,
                             dtype=None if args.weight_int8 else dtype)
    blob = export_forward(model.apply, params, args.batch, args.size,
                          args.size, dtype=dtype, path=args.output,
                          pointwise_int8=args.weight_int8)
    print(json.dumps({
        "artifact": args.output, "bytes": len(blob),
        "model": args.model, "weights": weights,
        "weight_int8": bool(args.weight_int8),
        "input": [args.batch, args.size, args.size, 3],
        "dtype": str(np.dtype(dtype)), "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
