"""CSV-indexed noisy-pair patch dataset (v2 sampling semantics).

Re-implements the behaviour of the reference's `ImageSuperResolution` v2
(/root/reference/exploration/model_multiscale_mixture_GLR/lib/dataloader_v2.py:69-242),
torch-free:

  * big images (both sides > 800) are pre-tiled into 512×512 tiles with
    overlap 96; small ones contribute a single tile;
  * `max_num_patchs` random crop positions are drawn over the tiles with a
    seeded RandomState (seed 2204 default), permuted, subselected;
  * items: load → crop → symmetric-pad if the tile is smaller than the
    patch (cv2 BORDER_REFLECT ≡ numpy "symmetric") → floor dims to /16 →
    optional dihedral augment → /255 → degradation noise;
  * returns (noisy, clean) float32 HWC pairs.

Also provides `build_image_index` (the capability of the reference's
exploration/2001-create-datasets-info.ipynb): scan an image folder into the
`index,path,height,width,nchannels` CSV schema.
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass, field

import numpy as np

from irdu_tpu.data.augment import dihedral_augment, sample_augment_mode
from irdu_tpu.data.degradations import add_noise

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.array(Image.open(path))


def build_image_index(root_folder: str, out_csv: str,
                      subdirs: list[str] | None = None) -> int:
    """Scan `root_folder` (or given subdirs) for images and write the
    reference CSV schema. Returns the number of rows written."""
    rows = []
    roots = [os.path.join(root_folder, s) for s in subdirs] if subdirs else [root_folder]
    for r in roots:
        for dirpath, _, files in sorted(os.walk(r)):
            for f in sorted(files):
                if not f.lower().endswith(_IMG_EXTS):
                    continue
                full = os.path.join(dirpath, f)
                img = _load_image(full)
                h, w = img.shape[:2]
                c = 1 if img.ndim == 2 else img.shape[2]
                rows.append((os.path.relpath(full, root_folder), h, w, c))
    with open(out_csv, "w", newline="") as fh:
        writer = csv.writer(fh)
        writer.writerow(["index", "path", "height", "width", "nchannels"])
        for i, (p, h, w, c) in enumerate(rows):
            writer.writerow([i, p, h, w, c])
    return len(rows)


def read_image_index(csv_path: str) -> list[dict]:
    with open(csv_path, newline="") as fh:
        return [
            {
                "path": row["path"],
                "height": int(row["height"]),
                "width": int(row["width"]),
                "nchannels": int(row["nchannels"]),
            }
            for row in csv.DictReader(fh)
        ]


@dataclass
class PatchDataset:
    """sampling modes (one per reference dataloader generation):
      "random_tiled" — v2 (dataloader_v2.py): big images pre-tiled 512/96,
                       seeded random crops (the flagship trainers' mode);
      "grid"         — v1 (dataloader.py): fixed-overlap grid of patch
                       positions over every image;
      "resize"       — v3 (dataloader_v3.py): like v2 but big images would
                       be resized to short-side 512 — and are then DROPPED
                       (the reference never appends them, dataloader_v3.py:137;
                       quirk kept); the noisy patch is clipped to [0,1].
    """

    csv_path: str
    root_folder: str
    patch_size: tuple[int, int] = (64, 64)
    max_num_patchs: int = 100000
    dist_mode: str = "addictive_noise_scale"
    lambda_noise: object = 25.0
    use_data_aug: bool = False
    seed: int = 2204
    sampling: str = "random_tiled"
    patch_overlap_size: tuple[int, int] = (32, 32)  # grid mode (v1)
    clip_noisy: bool | None = None  # default: True only for "resize" (v3)
    # tiling plan constants (reference create_all_images, dataloader_v2.py:111-113)
    tile_size: int = 512
    tile_overlap: int = 96
    tile_threshold: int = 800
    cache_images: bool = True

    _tiles: list[dict] = field(default_factory=list, init=False, repr=False)
    _patches: list[dict] = field(default_factory=list, init=False, repr=False)
    _cache: dict = field(default_factory=dict, init=False, repr=False)

    def __post_init__(self):
        self.random_state = np.random.RandomState(seed=self.seed)
        self._item_seed = self.seed
        self._create_tiles()
        self._create_patches(self.max_num_patchs)
        self._permute_subselect(self.max_num_patchs)

    # -- sampling plan ---------------------------------------------------

    def _create_tiles(self):
        infos = read_image_index(self.csv_path)
        tiles = []
        for info in infos:
            h, w, c = info["height"], info["width"], info["nchannels"]
            path = os.path.join(self.root_folder, info["path"])
            if self.sampling == "resize":
                # v3: big images are built-but-dropped (reference quirk)
                if not ((w > self.tile_threshold) and (h > self.tile_threshold)):
                    tiles.append({
                        "row": 0, "col": 0, "height": h, "width": w,
                        "nchannels": c, "path": path,
                    })
                continue
            if (w > self.tile_threshold) and (h > self.tile_threshold):
                step = self.tile_size - self.tile_overlap
                for row in np.arange(0, h - self.tile_size, step):
                    for col in np.arange(0, w - self.tile_size, step):
                        tiles.append({
                            "row": int(row), "col": int(col),
                            "height": self.tile_size, "width": self.tile_size,
                            "nchannels": c, "path": path,
                        })
            else:
                tiles.append({
                    "row": 0, "col": 0, "height": h, "width": w,
                    "nchannels": c, "path": path,
                })
        self._tiles = tiles

    def _create_patches(self, max_num_patchs: int):
        """Draw crop positions with the same RNG call pattern as the
        reference (randint per eligible tile, loops until max covered).
        Grid mode (v1) enumerates fixed-overlap positions instead."""
        if self.sampling == "grid":
            patches = []
            ph, pw = self.patch_size
            oh, ow = self.patch_overlap_size
            for tile in self._tiles:
                if tile["nchannels"] > 3:
                    continue
                for row in np.arange(0, tile["height"] - ph, ph - oh):
                    for col in np.arange(0, tile["width"] - pw, pw - ow):
                        patches.append({
                            "row": int(row), "col": int(col),
                            "padding": False, "path": tile["path"],
                        })
            self._patches_all = patches
            return
        patches = []
        n_loops = max_num_patchs // max(len(self._tiles), 1) + 1
        ph, pw = self.patch_size
        for _ in range(n_loops):
            for tile in self._tiles:
                if tile["nchannels"] > 3:
                    continue
                if (ph < tile["height"]) and (pw < tile["width"]):
                    patches.append({
                        "row": tile["row"] + int(self.random_state.randint(0, tile["height"] - ph)),
                        "col": tile["col"] + int(self.random_state.randint(0, tile["width"] - pw)),
                        "padding": False,
                        "path": tile["path"],
                    })
                else:
                    patches.append({
                        "row": tile["row"], "col": tile["col"],
                        "padding": True, "path": tile["path"],
                    })
        self._patches_all = patches

    def _permute_subselect(self, max_num_patchs: int):
        ind = self.random_state.permutation(len(self._patches_all))[:max_num_patchs]
        self._patches = [self._patches_all[i] for i in ind]

    def reroll(self, seed: int):
        """Re-draw crop positions (per-epoch reshuffle; the analogue of the
        environ ResumeableSampler's 2024+epoch reseed)."""
        self.random_state = np.random.RandomState(seed=seed)
        self._item_seed = seed
        self._create_patches(self.max_num_patchs)
        self._permute_subselect(self.max_num_patchs)

    # -- item access -----------------------------------------------------

    def __len__(self):
        return len(self._patches)

    def _image(self, path: str) -> np.ndarray:
        if not self.cache_images:
            return _load_image(path)
        if path not in self._cache:
            self._cache[path] = _load_image(path)
        return self._cache[path]

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        # Per-item RNG derived from (dataset seed, idx): item content is a
        # pure function of the index, so a threaded loader stays
        # deterministic and resume-by-skip replays identical batches (the
        # plan RNG `self.random_state` stays sequential for crop positions).
        item_rs = np.random.RandomState(
            np.random.MT19937(np.random.SeedSequence((self._item_seed, idx)))
        )
        rec = self._patches[idx]
        img = self._image(rec["path"])
        ph, pw = self.patch_size
        patch = img[rec["row"]: rec["row"] + ph, rec["col"]: rec["col"] + pw, :]
        if rec["padding"]:
            h, w = patch.shape[:2]
            patch = np.pad(
                patch, ((0, ph - h), (0, pw - w), (0, 0)), mode="symmetric"
            )
        h_, w_ = (patch.shape[0] // 16) * 16, (patch.shape[1] // 16) * 16
        patch = patch[:h_, :w_]
        if self.use_data_aug:
            patch = dihedral_augment(patch, sample_augment_mode(item_rs))
        patch = patch.astype(np.float32) / 255.0
        noisy = add_noise(patch, self.dist_mode, self.lambda_noise, item_rs)
        clip = self.clip_noisy if self.clip_noisy is not None else (self.sampling == "resize")
        if clip:
            noisy = np.clip(noisy, 0.0, 1.0)
        return noisy, patch

    # -- native batch path -------------------------------------------------

    def native_compatible(self) -> bool:
        """True when `get_batch` can serve items bit-identically to
        `__getitem__`: 3-channel uint8 sources, supported noise mode, and
        (if augmenting) a square /16-floored patch."""
        from irdu_tpu.data import native

        if not native.available():
            return False
        from irdu_tpu.data.degradations import _ALIASES

        mode = _ALIASES.get(self.dist_mode, self.dist_mode)
        if mode not in ("addictive_noise", "addictive_noise_scale",
                        "vary_addictive_noise", "none", "", None):
            return False
        ph, pw = self.patch_size
        if self.use_data_aug and (ph // 16) * 16 != (pw // 16) * 16:
            return False
        return True

    def get_batch(self, indices, num_threads: int = 0
                  ) -> tuple[np.ndarray, np.ndarray]:
        """Assemble a whole (noisy, clean) batch in the native C++ pipeline
        (threads across items; bit-exact with `__getitem__` per item —
        tests/test_native_data.py)."""
        from irdu_tpu.data import native
        from irdu_tpu.data.degradations import _ALIASES

        recs = [self._patches[int(i)] for i in indices]
        images = [self._image(r["path"]) for r in recs]
        crops = np.array([[r["row"], r["col"]] for r in recs], np.int32)
        pads = np.array([r["padding"] for r in recs], np.uint8)
        idx = np.asarray(list(indices), np.int64)
        clip = (self.clip_noisy if self.clip_noisy is not None
                else (self.sampling == "resize"))
        return native.make_pairs(
            images, crops, pads, idx,
            patch_size=tuple(self.patch_size),
            seed=self._item_seed,
            use_aug=self.use_data_aug,
            dist_mode=_ALIASES.get(self.dist_mode, self.dist_mode),
            lambda_noise=self.lambda_noise,
            clip=bool(clip),
            num_threads=num_threads,
        )
