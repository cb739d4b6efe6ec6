"""Input-pipeline throughput: native (C++) vs python batch assembly.

Measures steady-state items/s of `batched_loader` for both backends on
trainer-realistic patch shapes (the flagship progressive schedule's
128/192/256/384 and the natural-finetune 510x464 tiles regime), plus the
single-threaded per-item assembly cost. No JAX involved — host-only.

Run: python scripts/microbench_loader.py
"""

from __future__ import annotations

import argparse
import tempfile
import time

import numpy as np

from irdu_tpu.data import native
from irdu_tpu.data.dataset import PatchDataset
from irdu_tpu.data.loader import batched_loader
from irdu_tpu.data.synthetic import write_synthetic_corpus


def bench_backend(ds, batch_size, backend, n_batches=30, workers=8):
    it = batched_loader(
        ds, batch_size, backend=backend, num_workers=workers,
        indices=iter(np.arange(n_batches * batch_size + batch_size) % len(ds)),
    )
    next(it)  # warm (image cache fill, lib load)
    t0 = time.perf_counter()
    n = 0
    for noisy, clean in it:
        n += noisy.shape[0]
    dt = time.perf_counter() - t0
    return n / dt, noisy.nbytes * 2 * (n / batch_size) / dt / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[128, 192, 256, 384])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    print(f"native available: {native.available()} ({native.load_error()})")
    with tempfile.TemporaryDirectory() as root:
        csv_path = write_synthetic_corpus(
            root, n_images=12, size_range=(420, 520), seed=7)
        for ps in args.sizes:
            ds = PatchDataset(
                csv_path=csv_path, root_folder=root, patch_size=(ps, ps),
                max_num_patchs=4000, dist_mode="addictive_noise_scale",
                lambda_noise=25.0, use_data_aug=True, seed=2204,
            )
            row = {}
            for backend in ("python", "native"):
                ips, gbs = bench_backend(ds, args.batch, backend,
                                         workers=args.workers)
                row[backend] = (ips, gbs)
            sp = row["native"][0] / row["python"][0]
            print(f"patch {ps:4d}²  b{args.batch}: "
                  f"python {row['python'][0]:8.1f} it/s ({row['python'][1]:.2f} GB/s)  "
                  f"native {row['native'][0]:8.1f} it/s ({row['native'][1]:.2f} GB/s)  "
                  f"speedup {sp:.2f}x")


if __name__ == "__main__":
    main()
