"""End-to-end serving measurement for the recommended bundles (VERDICT r4 #7).

Exports the two recommended serving configs as .irdu artifacts
(deploy CLI path) and measures END-TO-END throughput including host IO:
fresh float32 numpy frames in, clipped numpy frames back, sequential
dispatch with a bounded in-flight queue — the number a serving operator
would see, as opposed to the marginal on-chip kernel rate bench.py
reports.

Bundles (PERF.md round-4 deployment-lever conclusions):
  * flagship cg3 exact (the recommended quality config), bf16 weights and
    weight-int8 (measured quality-free, ~4x smaller artifact);
  * micro cg1 batch=8 (the measured 63.8 MP/s deployment point).

Usage (real TPU): python scripts/measure_serving.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BUNDLES = [
    # (tag, deploy argv, batch, size, frames)
    ("flagship_cg3_512", ["--model", "flagship",
                          "--weights", "artifacts/weights/flagship_50k_51000.npz",
                          "--size", "512", "--cg-iters", "3"], 1, 512, 12),
    ("flagship_cg3_512_int8", ["--model", "flagship",
                               "--weights", "artifacts/weights/flagship_50k_51000.npz",
                               "--size", "512", "--cg-iters", "3",
                               "--weight-int8"], 1, 512, 12),
    ("micro_cg1_b8_512", ["--model", "micro",
                          "--weights", "artifacts/weights/micro_synthetic_2050.npz",
                          "--size", "512", "--cg-iters", "1",
                          "--batch", "8"], 8, 512, 16),
]


def main():
    import jax

    from irdu_tpu.deploy import load_exported, main as deploy_main
    from irdu_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    os.makedirs("artifacts/serving", exist_ok=True)
    rows = []
    for tag, argv, batch, size, frames in BUNDLES:
        path = f"artifacts/serving/{tag}.irdu"
        deploy_main(argv + ["--output", path])
        run = load_exported(path)
        rng = np.random.RandomState(0)
        feed = [rng.rand(batch, size, size, 3).astype(np.float32)
                for _ in range(4)]

        def frame(i):
            # fresh host frame -> device -> model -> host readback
            out = np.asarray(run(feed[i % 4]))
            return float(out.reshape(-1)[0])

        frame(0)  # warm
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(frames):
            acc += frame(i)
        dt = time.perf_counter() - t0
        mp = frames * batch * size * size / 1e6 / dt
        row = {"bundle": tag, "artifact_bytes": os.path.getsize(path),
               "frames": frames, "batch": batch, "size": size,
               "seconds": round(dt, 3), "end_to_end_mp_per_s": round(mp, 2),
               "checksum": round(acc, 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
