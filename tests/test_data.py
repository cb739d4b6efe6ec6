"""Data layer: augmentation, degradations, dataset sampling semantics,
loaders."""

import numpy as np
import pytest

from irdu_tpu.data.augment import dihedral_augment
from irdu_tpu.data.degradations import add_noise, eval_noise
from irdu_tpu.data.dataset import PatchDataset, read_image_index
from irdu_tpu.data.loader import batched_loader, device_prefetch
from irdu_tpu.data.synthetic import write_synthetic_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    csv_path = write_synthetic_corpus(str(root), n_images=6, size_range=(80, 160), seed=3)
    return str(root), csv_path


def test_augment_modes_are_dihedral(rng):
    img = rng.randn(8, 6, 3).astype(np.float32)
    outs = [dihedral_augment(img, m) for m in range(8)]
    # all 8 distinct, shapes correct, involution structure
    np.testing.assert_array_equal(outs[0], img)
    assert outs[1].shape == (8, 6, 3)
    assert outs[2].shape == (6, 8, 3)
    np.testing.assert_array_equal(dihedral_augment(outs[4], 4), img)
    flat = {o.tobytes() for o in outs}
    assert len(flat) == 8


def test_noise_modes_match_reference_streams(rng):
    """Same RandomState seed ⇒ identical noise as the reference's call
    pattern (draw normal with given scale vs unit-scale multiply)."""
    patch = np.zeros((16, 16, 3), np.float32)
    rs1 = np.random.RandomState(7)
    noisy = add_noise(patch, "addictive_noise", 25.0, rs1)
    rs2 = np.random.RandomState(7)
    expect = rs2.normal(0.0, 25.0 / 255.0, patch.shape).astype(np.float32)
    np.testing.assert_allclose(noisy, expect, atol=1e-7)

    rs1 = np.random.RandomState(7)
    noisy = add_noise(patch, "addictive_noise_scale", 25.0, rs1)
    rs2 = np.random.RandomState(7)
    expect = (rs2.normal(0.0, 1.0, patch.shape) * (25.0 / 255.0)).astype(np.float32)
    np.testing.assert_allclose(noisy, expect, atol=1e-7)

    rs1 = np.random.RandomState(7)
    levels = ([1.0, 10.0, 15.0, 20.0, 25.0], [0.1, 0.1, 0.1, 0.1, 0.6])
    noisy = add_noise(patch, "vary_addictive_noise", levels, rs1)
    assert np.std(noisy) > 0

    n1 = eval_noise((8, 8, 3), 25.0, seed=2204)
    n2 = np.random.RandomState(2204).normal(0, 25.0 / 255.0, (8, 8, 3))
    np.testing.assert_allclose(n1, n2)


def test_index_build_and_read(corpus):
    root, csv_path = corpus
    infos = read_image_index(csv_path)
    assert len(infos) == 6
    for info in infos:
        assert info["height"] >= 80 and info["width"] >= 80
        assert info["nchannels"] == 3


def test_patch_dataset_shapes_and_determinism(corpus):
    root, csv_path = corpus
    ds = PatchDataset(
        csv_path=csv_path, root_folder=root, patch_size=(48, 48),
        max_num_patchs=40, dist_mode="addictive_noise_scale",
        lambda_noise=25.0, use_data_aug=True, seed=11,
    )
    assert len(ds) == 40
    noisy, clean = ds[0]
    assert noisy.shape == (48, 48, 3) and clean.shape == (48, 48, 3)
    assert noisy.dtype == np.float32 and clean.dtype == np.float32
    assert 0.0 <= clean.min() and clean.max() <= 1.0
    # same seed -> same items
    ds2 = PatchDataset(
        csv_path=csv_path, root_folder=root, patch_size=(48, 48),
        max_num_patchs=40, dist_mode="addictive_noise_scale",
        lambda_noise=25.0, use_data_aug=True, seed=11,
    )
    n2, c2 = ds2[0]
    np.testing.assert_array_equal(noisy, n2)
    np.testing.assert_array_equal(clean, c2)
    # noise std is in the right ballpark
    assert abs(np.std(noisy - clean) - 25.0 / 255.0) < 0.01


def test_patch_dataset_pads_small_images(corpus):
    root, csv_path = corpus
    ds = PatchDataset(
        csv_path=csv_path, root_folder=root, patch_size=(192, 192),
        max_num_patchs=10, dist_mode="", lambda_noise=None, seed=1,
    )
    noisy, clean = ds[0]
    # all corpus images are < 192 -> symmetric padding path
    assert clean.shape == (192, 192, 3)


def test_batched_loader_and_prefetch(corpus):
    root, csv_path = corpus
    ds = PatchDataset(
        csv_path=csv_path, root_folder=root, patch_size=(32, 32),
        max_num_patchs=10, dist_mode="addictive_noise", lambda_noise=15.0, seed=5,
    )
    batches = list(device_prefetch(batched_loader(ds, batch_size=4)))
    assert len(batches) == 2  # 10 items, drop_last
    noisy, clean = batches[0]
    assert noisy.shape == (4, 32, 32, 3)
    import jax

    assert isinstance(noisy, jax.Array)


def test_threaded_loader_is_deterministic(corpus):
    """Item content is a pure function of the index (per-item RNG), so the
    4-thread loader reproduces itself batch-for-batch — the property the
    trainer's resume skip-replay relies on (ADVICE r1)."""
    root, csv_path = corpus

    def make():
        return PatchDataset(
            csv_path=csv_path, root_folder=root, patch_size=(32, 32),
            max_num_patchs=12, dist_mode="addictive_noise_scale",
            lambda_noise=25.0, use_data_aug=True, seed=9,
        )

    run1 = list(batched_loader(make(), batch_size=3, num_workers=4))
    run2 = list(batched_loader(make(), batch_size=3, num_workers=1))
    assert len(run1) == len(run2) == 4
    for (n1, c1), (n2, c2) in zip(run1, run2):
        np.testing.assert_array_equal(n1, n2)
        np.testing.assert_array_equal(c1, c2)


def test_grid_sampling_mode(corpus):
    """v1 (dataloader.py) semantics: fixed-overlap grid positions."""
    root, csv_path = corpus
    ds = PatchDataset(
        csv_path=csv_path, root_folder=root, patch_size=(48, 48),
        patch_overlap_size=(24, 24), max_num_patchs=1000,
        dist_mode="vary_addictive_noise",
        lambda_noise=([1.0, 15.0, 25.0], [0.2, 0.2, 0.6]),
        sampling="grid", seed=2204,
    )
    assert len(ds) > 0
    noisy, clean = ds[0]
    assert clean.shape == (48, 48, 3)


def test_resize_sampling_clips_noisy(corpus):
    """v3 (dataloader_v3.py) semantics: noisy clipped to [0,1]."""
    root, csv_path = corpus
    ds = PatchDataset(
        csv_path=csv_path, root_folder=root, patch_size=(32, 32),
        max_num_patchs=8, dist_mode="addictive_noise", lambda_noise=50.0,
        sampling="resize", seed=3,
    )
    noisy, clean = ds[0]
    assert noisy.min() >= 0.0 and noisy.max() <= 1.0


def test_ycbcr_roundtrip(rng):
    from irdu_tpu.data.color import rgb2ycbcr, ycbcr2rgb

    rgb = rng.rand(5, 7, 3)
    ycc = rgb2ycbcr(rgb)
    assert 16.0 <= ycc[..., 0].min() and ycc[..., 0].max() <= 235.1
    np.testing.assert_allclose(ycbcr2rgb(ycc), rgb, atol=1e-10)
    try:
        from skimage.color import rgb2ycbcr as sk
        np.testing.assert_allclose(ycc, sk(rgb), atol=1e-6)
    except ImportError:
        pass


def test_loader_skip_batches_matches_replay(corpus):
    """Index-only fast-forward (batched_loader skip_batches — the trainer's
    mid-stage resume path) must reproduce the replayed stream exactly."""
    root, csv_path = corpus

    def make():
        return PatchDataset(
            csv_path=csv_path, root_folder=root, patch_size=(32, 32),
            max_num_patchs=12, dist_mode="addictive_noise_scale",
            lambda_noise=25.0, use_data_aug=True, seed=9,
        )

    full = list(batched_loader(make(), batch_size=2))
    skipped = list(batched_loader(make(), batch_size=2, skip_batches=3))
    assert len(skipped) == len(full) - 3
    for (n1, c1), (n2, c2) in zip(full[3:], skipped):
        np.testing.assert_array_equal(n1, n2)
        np.testing.assert_array_equal(c1, c2)
