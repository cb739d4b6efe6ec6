"""Eval harness: quantization conventions, padding, protocol equivalence
with the reference eval loop."""

import numpy as np
import pytest

from irdu_tpu.eval.harness import evaluate_pairs, pad_to_multiple
from irdu_tpu.eval.metrics import img_as_ubyte, psnr_255, psnr_unit


def test_img_as_ubyte_matches_skimage(rng):
    skimage = pytest.importorskip("skimage")
    from skimage import img_as_ubyte as sk_ubyte

    x = rng.rand(17, 13, 3).astype(np.float32)
    np.testing.assert_array_equal(img_as_ubyte(x), sk_ubyte(x))


def test_pad_to_multiple_reflect():
    img = np.arange(5 * 7 * 3, dtype=np.float32).reshape(5, 7, 3)
    padded, h, w = pad_to_multiple(img, 4)
    assert (h, w) == (5, 7)
    assert padded.shape == (8, 8, 3)
    # torch F.pad 'reflect': row 5 = row 3 (edge-excluded reflection)
    np.testing.assert_array_equal(padded[5], padded[3])
    np.testing.assert_array_equal(padded[:, 7], padded[:, 5])


def test_psnr_conventions():
    a = np.full((4, 4), 100.0)
    b = np.full((4, 4), 110.0)
    assert abs(psnr_255(a, b) - 20 * np.log10(255 / 10)) < 1e-9
    assert psnr_255(a, a) == float("inf")
    assert abs(psnr_unit(np.zeros(4), np.full(4, 0.1)) - 20.0) < 1e-6


def test_evaluate_pairs_protocol(rng):
    """Identity model: output PSNR equals the noisy-input PSNR computed with
    the reference's exact protocol (seeded noise, ubyte quantization)."""
    images = [
        (rng.rand(37, 45, 3) * 255).astype(np.uint8),
        (rng.rand(64, 48, 3) * 255).astype(np.uint8),
    ]
    out = evaluate_pairs(lambda x: x, images, sigma=25.0, seed=2204)
    # replicate manually
    rs = np.random.RandomState(2204)
    expect = []
    for img in images:
        true_255 = img.astype(np.float32)
        noisy = true_255 / 255.0 + rs.normal(0, 25.0 / 255.0, true_255.shape)
        rest = img_as_ubyte(np.clip(noisy, 0, 1)).astype(np.float32)
        expect.append(psnr_255(true_255, rest))
    np.testing.assert_allclose(out["psnr"], expect, atol=1e-9)
    # σ=25 noisy-input PSNR is ~20.2 dB
    assert 19.5 < out["mean_psnr"] < 21.0


def test_evaluate_pairs_bucket_crops_correctly(rng):
    images = [(rng.rand(50, 70, 3) * 255).astype(np.uint8)]
    seen = {}

    def fwd(x):
        seen["shape"] = x.shape
        return x

    out = evaluate_pairs(fwd, images, sigma=10.0, bucket=64)
    assert seen["shape"] == (1, 64, 128, 3)
    assert len(out["psnr"]) == 1


def test_run_benchmark_eval_sweep(tmp_path, rng):
    """The README.ipynb cell-10 capability: sweep several CSV-indexed
    benchmark sets, save denoised triptychs."""
    import os

    from irdu_tpu.data.synthetic import write_synthetic_corpus
    from irdu_tpu.eval.harness import run_benchmark_eval

    roots = {}
    for name in ("setA", "setB"):
        root = str(tmp_path / name)
        csv = write_synthetic_corpus(root, n_images=2, size_range=(40, 60), seed=1)
        roots[name] = (csv, root)

    out_dir = str(tmp_path / "result_images")
    results = run_benchmark_eval(lambda x: x, roots, sigma=25.0,
                                 save_dir=out_dir, save_tag="LGU")
    assert set(results) == {"setA", "setB"}
    for r in results.values():
        assert len(r["psnr"]) == 2 and 18 < r["mean_psnr"] < 22
    files = os.listdir(out_dir)
    assert any(f.endswith("_LGU_denoised.png") for f in files)
    assert any("_clean" in f for f in files) and any("_noisy" in f for f in files)


def test_evaluate_pairs_batched_matches_sequential(rng):
    """The batched/bucketed path (VERDICT r1 #7) preserves the protocol:
    same index-order noise stream, same per-image PSNRs as the sequential
    path at matching pad bucket, with mixed shapes and a short last batch."""
    from irdu_tpu.eval.harness import evaluate_pairs_batched

    def forward(batch):  # shape-preserving "denoiser": a fixed blur
        out = batch.copy()
        out[:, 1:-1] = (batch[:, :-2] + batch[:, 1:-1] + batch[:, 2:]) / 3.0
        return out

    images = [
        (rng.rand(40, 56, 3) * 255).astype(np.uint8),
        (rng.rand(40, 56, 3) * 255).astype(np.uint8),
        (rng.rand(40, 56, 3) * 255).astype(np.uint8),
        (rng.rand(24, 30, 3) * 255).astype(np.uint8),  # second bucket
        (rng.rand(40, 50, 3) * 255).astype(np.uint8),  # pads into bucket 1
    ]
    seq = evaluate_pairs(forward, images, sigma=15.0, bucket=8)
    bat = evaluate_pairs_batched(forward, images, sigma=15.0, bucket=8,
                                 batch_size=2)
    np.testing.assert_allclose(bat["psnr"], seq["psnr"], atol=1e-4)
    assert bat["mp_per_s"] > 0
    # on-device metrics path (f32 reductions): same protocol within tol
    dev = evaluate_pairs_batched(forward, images, sigma=15.0, bucket=8,
                                 batch_size=2, device_metrics=True)
    np.testing.assert_allclose(dev["psnr"], seq["psnr"], atol=5e-3)
