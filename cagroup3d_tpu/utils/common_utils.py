"""Misc utilities (rebuild of pcdet/utils/common_utils.py subset used by
the indoor pipeline): logger, seeding, dist info."""
from __future__ import annotations

import logging
import os
import random

import numpy as np


def create_logger(log_file=None, rank=0, log_level=logging.INFO):
    logger = logging.getLogger(f"cagroup3d_tpu_r{rank}")
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.handlers.clear()
    formatter = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    console = logging.StreamHandler()
    console.setLevel(log_level if rank == 0 else logging.ERROR)
    console.setFormatter(formatter)
    logger.addHandler(console)
    if log_file is not None:
        fh = logging.FileHandler(log_file)
        fh.setLevel(log_level if rank == 0 else logging.ERROR)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def set_random_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)


def get_dist_info():
    """Process index / count under jax.distributed (single-process: 0/1)."""
    try:
        import jax
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1
