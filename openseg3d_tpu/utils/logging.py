"""Process-aware logging.

TPU-native analog of the reference's rank-aware logger
(seg3d/utils/logging.py:10-110): JAX multi-host processes replace torch ranks,
so process 0 logs at INFO (console + optional file) and all other hosts log at
ERROR only.
"""

from __future__ import annotations

import logging
import os

_initialized: dict[str, logging.Logger] = {}


def _process_index() -> int:
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


def get_logger(name: str = 'openseg3d_tpu', log_file: str | None = None,
               log_level: int = logging.INFO) -> logging.Logger:
    if name in _initialized:
        return _initialized[name]

    logger = logging.getLogger(name)
    logger.propagate = False
    rank = _process_index()

    fmt = logging.Formatter('%(asctime)s - %(name)s - %(levelname)s - %(message)s')
    stream = logging.StreamHandler()
    stream.setFormatter(fmt)
    logger.addHandler(stream)

    if rank == 0:
        if log_file is not None:
            os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
            fh = logging.FileHandler(log_file, 'a')
            fh.setFormatter(fmt)
            logger.addHandler(fh)
        logger.setLevel(log_level)
    else:
        logger.setLevel(logging.ERROR)

    _initialized[name] = logger
    return logger


def get_root_logger(log_file: str | None = None, log_level: int = logging.INFO) -> logging.Logger:
    return get_logger('openseg3d_tpu', log_file, log_level)
