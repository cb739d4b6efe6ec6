"""Framework utilities: config parsing, logging, seeding."""

from irdu_tpu.utils.config import load_config, pretty_config
from irdu_tpu.utils.logging import get_root_logger
from irdu_tpu.utils.seeding import set_random_seed
