"""Full-image benchmark evaluation — the reference protocol, jit-friendly.

Protocol (reference eval loops, scripts_v2/run_abtract_lightformer_GGTV_GGLR_
sigma25.py:235-343 and GGTV_GGLR_v1.0/README.ipynb cell 10):

  * one np.random.RandomState(2204) shared across a dataset, noise drawn
    per image in index order: ``+ N(0, σ/255)``;
  * reflect-pad (edge-excluded) bottom/right to a multiple of 16;
  * forward pass, crop back, clamp to [0,1];
  * quantize with img_as_ubyte, PSNR vs the 255-scale uint8 truth.

TPU notes: jit recompiles per input shape, so `evaluate_pairs` optionally
buckets images — pad to the next multiple of `bucket` (with reflect
padding) so a whole benchmark set shares a handful of compiled shapes.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Iterable, Sequence

import numpy as np

from irdu_tpu.data.degradations import eval_noise
from irdu_tpu.eval.metrics import img_as_ubyte, psnr_255


def pad_to_multiple(img: np.ndarray, factor: int = 16) -> tuple[np.ndarray, int, int]:
    """Reflect-pad bottom/right so H, W are multiples of `factor` (torch
    F.pad 'reflect' == numpy 'reflect': edge sample not repeated).
    Returns (padded, orig_h, orig_w)."""
    h, w = img.shape[:2]
    pad_h = (factor - h % factor) % factor
    pad_w = (factor - w % factor) % factor
    if pad_h or pad_w:
        img = np.pad(img, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
    return img, h, w


def evaluate_pairs(
    forward: Callable[[np.ndarray], np.ndarray],
    images_255: Iterable[np.ndarray],
    sigma: float,
    *,
    seed: int = 2204,
    factor: int = 16,
    bucket: int | None = None,
    save_dir: str | None = None,
    save_tag: str = "LGU",
    dataset_name: str = "set",
    compute_ssim: bool = False,
    masks: Sequence[np.ndarray | None] | None = None,
) -> dict:
    """Run the benchmark protocol over uint8 HWC images.

    forward: maps (1, H, W, 3) float32 → (1, H, W, 3) (jitted model apply).
    bucket: if set, additionally pad each image up to a multiple of
    `bucket` to bound the number of compiled shapes; output is cropped, so
    the metric is unchanged up to the model's boundary sensitivity.
    masks: optional per-image boolean HxW arrays of SUSPECT pixels to
    exclude from an additional "masked_psnr" metric (used by the natural
    eval set to bound annotation-overlay contamination — VERDICT r2 #10).

    Returns {"psnr": [...], "mean_psnr": float, "seconds": [...]}.
    """
    rs = np.random.RandomState(seed=seed)
    psnrs, times, ssims, masked_psnrs = [], [], [], []
    pad_factor = bucket if bucket else factor
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
    for img_i, img_255 in enumerate(images_255):
        img_true_255 = img_255.astype(np.float32)
        img_true = img_true_255 / 255.0
        noisy = img_true + rs.normal(0, sigma / 255.0, img_true.shape)
        noisy = noisy.astype(np.float32)
        padded, h, w = pad_to_multiple(noisy, pad_factor)
        t0 = time.perf_counter()
        restored = np.asarray(forward(padded[None]))[0]
        times.append(time.perf_counter() - t0)
        restored = np.clip(restored[:h, :w], 0.0, 1.0)
        restored_255 = img_as_ubyte(restored).astype(np.float32)
        psnrs.append(psnr_255(img_true_255, restored_255))
        if masks is not None and masks[img_i] is not None:
            keep = ~np.asarray(masks[img_i], bool)
            masked_psnrs.append(
                psnr_255(img_true_255[keep], restored_255[keep]))
        if compute_ssim:
            from irdu_tpu.eval.metrics import ssim_255

            ssims.append(ssim_255(img_true_255, restored_255))
        if save_dir:
            # clean/noisy/denoised triptych files, reference naming scheme
            # "{dataset}_sigma{σ}_{img}_{tag}_denoised.png" (README.ipynb cell 10)
            from PIL import Image

            stem = f"{dataset_name}_sigma{int(sigma)}_{img_i:03d}"
            Image.fromarray(img_255.astype(np.uint8)).save(
                os.path.join(save_dir, f"{stem}_clean.png"))
            Image.fromarray(img_as_ubyte(np.clip(noisy[:h, :w], 0, 1))).save(
                os.path.join(save_dir, f"{stem}_noisy.png"))
            Image.fromarray(restored_255.astype(np.uint8)).save(
                os.path.join(save_dir, f"{stem}_{save_tag}_denoised.png"))
    out = {
        "psnr": psnrs,
        "mean_psnr": float(np.mean(psnrs)),
        "seconds": times,
    }
    if masked_psnrs:
        out["masked_psnr"] = masked_psnrs
        out["mean_masked_psnr"] = float(np.mean(masked_psnrs))
    if compute_ssim:
        out["ssim"] = ssims
        out["mean_ssim"] = float(np.mean(ssims))
    return out


def evaluate_pairs_batched(
    forward: Callable[[np.ndarray], np.ndarray],
    images_255: Sequence[np.ndarray],
    sigma: float,
    *,
    seed: int = 2204,
    bucket: int = 64,
    batch_size: int = 4,
    max_in_flight: int = 3,
    device_metrics: bool = False,
) -> dict:
    """Chip-saturating version of `evaluate_pairs` (PERF backlog #3 /
    VERDICT r1 #7): images are bucketed by padded shape, stacked into
    fixed-size batches (short batches repeat their last image so each
    bucket compiles exactly one batch shape), and dispatched with up to
    `max_in_flight` batches queued — JAX dispatch is async, so host-side
    PSNR/quantization overlaps device compute.

    The noise protocol is unchanged: one RandomState(seed) drawn in image
    index order (reference README.ipynb cell 10), so per-image PSNRs match
    `evaluate_pairs` up to the model's padded-boundary sensitivity.

    forward: maps (batch_size, H, W, 3) float32 → same shape.
    device_metrics: quantize (img_as_ubyte) + mask-crop + PSNR on device
    and read back only per-image scalars — device→host image readback
    through remote-execution rigs can cost orders of magnitude more than
    the model itself (f32 reductions: ≲0.005 dB vs the f64 host path).
    Returns {"psnr", "mean_psnr", "seconds_total", "mp_per_s"}.
    """
    images = list(images_255)
    rs = np.random.RandomState(seed=seed)
    noisies = []
    for img_255 in images:  # index-order noise draw (protocol)
        img_true = img_255.astype(np.float32) / 255.0
        noisies.append((img_true + rs.normal(0, sigma / 255.0, img_true.shape))
                       .astype(np.float32))

    # bucket by padded shape
    groups: dict[tuple[int, int], list[int]] = {}
    padded = []
    for i, noisy in enumerate(noisies):
        p, h, w = pad_to_multiple(noisy, bucket)
        padded.append(p)
        groups.setdefault(p.shape[:2], []).append(i)

    psnrs = [0.0] * len(images)
    pending: list[tuple[list[int], object]] = []

    if device_metrics:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def _score(restored, true_pad, hs, ws):
            """uint8-protocol PSNR over the valid (h, w) region of each
            padded batch element; mirrors img_as_ubyte + psnr_255."""
            q = jnp.clip(jnp.rint(jnp.clip(restored, 0.0, 1.0) * 255.0),
                         0.0, 255.0)
            hgrid = jnp.arange(restored.shape[1])[None, :, None, None]
            wgrid = jnp.arange(restored.shape[2])[None, None, :, None]
            mask = ((hgrid < hs[:, None, None, None])
                    & (wgrid < ws[:, None, None, None]))
            se = jnp.sum(jnp.square(q - true_pad) * mask, axis=(1, 2, 3))
            n = (hs * ws * restored.shape[3]).astype(jnp.float32)
            mse = se / n
            return 20.0 * jnp.log10(255.0) - 10.0 * jnp.log10(mse)

        trues_pad = [
            np.pad(im.astype(np.float32),
                   ((0, p.shape[0] - im.shape[0]),
                    (0, p.shape[1] - im.shape[1]), (0, 0)))
            for im, p in zip(images, padded)
        ]

    def drain(entry):
        idxs, out = entry
        if device_metrics:
            for j, i in enumerate(idxs):
                psnrs[i] = float(out[j])
            return
        out = np.asarray(out)
        for j, i in enumerate(idxs):
            h, w = images[i].shape[:2]
            restored = np.clip(out[j, :h, :w], 0.0, 1.0)
            restored_255 = img_as_ubyte(restored).astype(np.float32)
            psnrs[i] = psnr_255(images[i].astype(np.float32), restored_255)

    # warm each bucket's compiled programs (forward + scorer) before the
    # clock starts: steady-state throughput is the quantity of interest,
    # and compiles through remote-execution rigs cost tens of seconds
    for key in groups:
        wb = np.zeros((batch_size, *key, images[0].shape[2]), np.float32)
        wout = forward(wb)
        if device_metrics:
            import jax.numpy as jnp

            _score(jnp.asarray(wout), jnp.asarray(wb),
                   jnp.ones(batch_size, np.int32),
                   jnp.ones(batch_size, np.int32)).block_until_ready()

    t0 = time.perf_counter()
    for key in groups:
        idxs = groups[key]
        for s in range(0, len(idxs), batch_size):
            chunk = idxs[s:s + batch_size]
            fill = chunk + [chunk[-1]] * (batch_size - len(chunk))
            batch = np.stack([padded[i] for i in fill])
            out = forward(batch)  # async dispatch
            if device_metrics:
                import jax.numpy as jnp

                tp = np.stack([trues_pad[i] for i in fill])
                hs = np.array([images[i].shape[0] for i in fill], np.int32)
                ws = np.array([images[i].shape[1] for i in fill], np.int32)
                # stays on device; drain syncs per-scalar
                out = _score(jnp.asarray(out), jnp.asarray(tp),
                             jnp.asarray(hs), jnp.asarray(ws))
            pending.append((chunk, out))
            if len(pending) >= max_in_flight:
                drain(pending.pop(0))
    for entry in pending:
        drain(entry)
    seconds = time.perf_counter() - t0

    true_px = sum(im.shape[0] * im.shape[1] for im in images)
    return {
        "psnr": psnrs,
        "mean_psnr": float(np.mean(psnrs)),
        "seconds_total": seconds,
        "mp_per_s": true_px / seconds / 1e6,
    }


def load_benchmark_images(csv_path: str, root_folder: str) -> list[np.ndarray]:
    from PIL import Image

    from irdu_tpu.data.dataset import read_image_index

    return [
        np.array(Image.open(os.path.join(root_folder, info["path"])))
        for info in read_image_index(csv_path)
    ]


def run_benchmark_eval(
    forward: Callable,
    datasets: dict[str, tuple[str, str]],
    sigma: float = 25.0,
    batched: bool = False,
    **kwargs,
) -> dict[str, dict]:
    """Evaluate several benchmark sets: {name: (csv_path, root_folder)} →
    {name: evaluate_pairs result}. Mirrors the README.ipynb cell-10 sweep
    over CBSD68/Kodak/McMaster/Urban100 (pass save_dir to also write the
    clean/noisy/denoised PNG triptychs). batched=True routes through
    `evaluate_pairs_batched` (bucketed fixed-shape batches, async
    dispatch) and reports throughput as mp_per_s."""
    results = {}
    for name, (csv_path, root) in datasets.items():
        images = load_benchmark_images(csv_path, root)
        if batched:
            results[name] = evaluate_pairs_batched(forward, images, sigma,
                                                   **kwargs)
        else:
            results[name] = evaluate_pairs(forward, images, sigma,
                                           dataset_name=name, **kwargs)
    return results
