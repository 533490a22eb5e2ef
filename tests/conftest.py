"""Test config: force CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4: the TPU-world replacement for the
fake-backend multi-node tests the reference lacks)."""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_default_matmul_precision', 'highest')
# persistent compile cache: the model graphs are large and XLA-CPU compiles are
# slow; cache across test processes/runs.
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_test_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2)
