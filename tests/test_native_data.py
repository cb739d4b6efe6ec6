"""Native (C++) input pipeline: bit-exact parity with the numpy path.

The native batch assembler (irdu_tpu/data/native/) re-implements the whole
per-item path of `PatchDataset.__getitem__` — per-index RandomState
(SeedSequence → MT19937), crop, symmetric pad, /16 floor, dihedral augment,
normalize, additive-Gaussian degradation — and must reproduce it
BIT-exactly (the trainer's resume skip-replay and the documented
deterministic-stream guarantee depend on item content being a pure
function of (seed, idx) regardless of backend)."""

import numpy as np
import pytest

from irdu_tpu.data import native
from irdu_tpu.data.dataset import PatchDataset
from irdu_tpu.data.loader import batched_loader
from irdu_tpu.data.synthetic import write_synthetic_corpus

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native lib unavailable: {native.load_error()}"
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus_native")
    csv_path = write_synthetic_corpus(
        str(root), n_images=6, size_range=(80, 160), seed=3)
    return str(root), csv_path


# ---------------------------------------------------------------------------
# RNG layer: the C++ legacy-numpy stack vs numpy itself
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed,idx", [(2204, 0), (2204, 123), (0, 0),
                                      (2**40 + 12345, 7)])
def test_rng_bit_exact(seed, idx):
    def fresh():
        return np.random.RandomState(
            np.random.MT19937(np.random.SeedSequence((seed, idx))))

    mt = np.random.MT19937(np.random.SeedSequence((seed, idx)))
    raw = np.random.Generator(mt).integers(0, 2**32, 1400, dtype=np.uint32)
    assert np.array_equal(raw.astype(np.float64), native.rng_probe(seed, idx, 0, 1400))

    ref = [int(fresh().randint(0, 7)) for _ in range(1)]  # first draw
    rs = fresh()
    ref = [int(rs.randint(0, 7)) for _ in range(100)]
    assert ref == native.rng_probe(seed, idx, 1, 100).astype(int).tolist()

    assert np.array_equal(fresh().normal(0, 1, 3001),
                          native.rng_probe(seed, idx, 2, 3001))
    assert np.array_equal(fresh().random_sample(500),
                          native.rng_probe(seed, idx, 3, 500))

    probs = [0.1, 0.2, 0.3, 0.4]
    rs = fresh()
    ref = [int(rs.choice(4, p=probs)) for _ in range(100)]
    assert ref == native.rng_probe(seed, idx, 4, 100, probs).astype(int).tolist()


# ---------------------------------------------------------------------------
# Full item assembly vs PatchDataset.__getitem__
# ---------------------------------------------------------------------------

def _assert_batch_matches_items(ds, indices):
    noisy_b, clean_b = ds.get_batch(indices)
    for k, i in enumerate(indices):
        noisy, clean = ds[i]
        np.testing.assert_array_equal(clean_b[k], clean)
        np.testing.assert_array_equal(noisy_b[k], noisy)


@pytest.mark.parametrize("use_aug", [False, True])
@pytest.mark.parametrize("dist_mode,lam", [
    ("addictive_noise_scale", 25.0),
    ("addictive_noise", 15.0),
    ("vary_addictive_noise", ([1.0, 15.0, 25.0, 50.0], [0.1, 0.2, 0.3, 0.4])),
    ("none", None),
])
def test_batch_parity(corpus, use_aug, dist_mode, lam):
    root, csv_path = corpus
    ds = PatchDataset(
        csv_path=csv_path, root_folder=root, patch_size=(48, 48),
        max_num_patchs=40, dist_mode=dist_mode, lambda_noise=lam,
        use_data_aug=use_aug, seed=11,
    )
    assert ds.native_compatible()
    _assert_batch_matches_items(ds, list(range(0, 40, 3)))


def test_batch_parity_padding_case(corpus):
    """Patch larger than every corpus image: symmetric-pad path (+augment
    on the padded square)."""
    root, csv_path = corpus
    ds = PatchDataset(
        csv_path=csv_path, root_folder=root, patch_size=(192, 192),
        max_num_patchs=10, dist_mode="addictive_noise_scale",
        lambda_noise=25.0, use_data_aug=True, seed=1,
    )
    _assert_batch_matches_items(ds, list(range(10)))


def test_batch_parity_resize_clip(corpus):
    """v3 semantics: noisy clipped to [0,1] (clip applied natively too)."""
    root, csv_path = corpus
    ds = PatchDataset(
        csv_path=csv_path, root_folder=root, patch_size=(32, 32),
        max_num_patchs=8, dist_mode="addictive_noise", lambda_noise=50.0,
        sampling="resize", seed=3,
    )
    _assert_batch_matches_items(ds, list(range(8)))


def test_batch_parity_nonsquare_floor16(corpus):
    """Non-square patch, /16 floor (56→48, 72→64), no augment."""
    root, csv_path = corpus
    ds = PatchDataset(
        csv_path=csv_path, root_folder=root, patch_size=(56, 72),
        max_num_patchs=8, dist_mode="addictive_noise_scale",
        lambda_noise=25.0, seed=4,
    )
    noisy, clean = ds.get_batch(list(range(8)))
    assert clean.shape == (8, 48, 64, 3)
    _assert_batch_matches_items(ds, list(range(8)))


# ---------------------------------------------------------------------------
# Loader integration
# ---------------------------------------------------------------------------

def test_loader_backends_bit_identical(corpus):
    root, csv_path = corpus

    def make():
        return PatchDataset(
            csv_path=csv_path, root_folder=root, patch_size=(32, 32),
            max_num_patchs=12, dist_mode="addictive_noise_scale",
            lambda_noise=25.0, use_data_aug=True, seed=9,
        )

    nat = list(batched_loader(make(), batch_size=3, backend="native"))
    py = list(batched_loader(make(), batch_size=3, backend="python"))
    assert len(nat) == len(py) == 4
    for (n1, c1), (n2, c2) in zip(nat, py):
        np.testing.assert_array_equal(n1, n2)
        np.testing.assert_array_equal(c1, c2)


def test_auto_backend_falls_back(corpus, monkeypatch):
    """backend='auto' must serve identical batches even when the native
    path fails at runtime (falls back to the python fetch)."""
    root, csv_path = corpus

    def make():
        return PatchDataset(
            csv_path=csv_path, root_folder=root, patch_size=(32, 32),
            max_num_patchs=6, dist_mode="addictive_noise_scale",
            lambda_noise=25.0, seed=2,
        )

    ds = make()

    def boom(indices, num_threads=0):
        raise RuntimeError("simulated native failure")

    monkeypatch.setattr(ds, "get_batch", boom)
    out = list(batched_loader(ds, batch_size=2, backend="auto"))
    ref = list(batched_loader(make(), batch_size=2, backend="python"))
    assert len(out) == len(ref) == 3
    for (n1, c1), (n2, c2) in zip(out, ref):
        np.testing.assert_array_equal(n1, n2)
        np.testing.assert_array_equal(c1, c2)
