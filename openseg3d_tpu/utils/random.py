"""RNG control.

The reference broadcasts a rank-0 seed over NCCL (seg3d/utils/random.py:11-38).
In the SPMD world every host derives the same seed deterministically, so the
"broadcast" is a host-0 choice + multihost broadcast when available.
"""

from __future__ import annotations

import random as _pyrandom

import numpy as np


def init_random_seed(seed: int | None = None) -> int:
    """Pick a seed on process 0 and share it with every process."""
    if seed is not None:
        return int(seed)
    seed = int(np.random.randint(2 ** 31))
    try:
        import jax
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            seed = int(multihost_utils.broadcast_one_to_all(np.int64(seed)))
    except Exception:
        pass
    return seed


def set_random_seed(seed: int) -> None:
    """Seed every host-side RNG. Device-side randomness flows through explicit
    jax.random keys, so nothing global to set there (determinism is the default
    on TPU — unlike the reference's atomicAdd kernels, SURVEY.md §5)."""
    _pyrandom.seed(seed)
    np.random.seed(seed % (2 ** 32))
