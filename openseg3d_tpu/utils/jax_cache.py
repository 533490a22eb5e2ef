"""Persistent XLA compilation cache setup.

The reference has no analog (PyTorch eager recompiles nothing); under JAX the
full-scale Segformer step costs minutes of XLA compile per process, so every
CLI (train/eval/test/bench/profile) enables the on-disk cache before first use.
Call before any jit execution; safe to call more than once.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = '/root/repo/.jax_cache'


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                            DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    # cache every entry, however small/fast — reruns on the axon tunnel pay
    # full XLA compile otherwise
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)
