"""Shared utilities: logging, stage timing, seeding."""

from monosowa_tpu.utils.logger import create_logger, set_random_seed  # noqa: F401
from monosowa_tpu.utils.timing import StageTimer  # noqa: F401
