"""Test config.

On a plain host this forces CPU with 8 virtual devices (SURVEY.md §4: the
TPU-world replacement for fake-backend multi-node tests). On the axon driver
box the sitecustomize registers the TPU plugin regardless of JAX_PLATFORMS, so
THE SUITE ACTUALLY RUNS ON THE REAL TPU THERE — deliberate: real-backend
coverage caught a TPU-only denormal-flush bug (ops/knn.py) that CPU hid, and
compiles go to the remote compile pool instead of this 1-core host. The
multi-device tests (test_multichip.py) force CPU in subprocesses themselves."""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_default_matmul_precision', 'highest')
# persistent compile cache: the model graphs are large and XLA-CPU compiles are
# slow; cache across test processes/runs. In-repo (NOT /tmp, which is wiped
# between sessions — a cold full-suite compile exceeds 25 min on a 1-core box;
# same fix as the bench cache, commit b3bd68b).
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      '.jax_test_cache')
jax.config.update('jax_compilation_cache_dir', _CACHE)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)
