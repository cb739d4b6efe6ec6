"""L4 data layer: CSV-indexed patch pipeline, degradation synthesis,
augmentation, and a prefetching device loader.

Host-side work is pure numpy (no torch); degradation RNG streams follow
the reference's np.random.RandomState sequences so noise realisations can
match bit-for-bit for parity runs.
"""

from irdu_tpu.data.augment import dihedral_augment
from irdu_tpu.data.degradations import add_noise
from irdu_tpu.data.dataset import PatchDataset, build_image_index
from irdu_tpu.data.loader import batched_loader, device_prefetch
