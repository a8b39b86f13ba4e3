"""Test harness config: run JAX on a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware."""

import os

# Force CPU even when a TPU platform plugin (axon) is registered via
# sitecustomize — that path overrides the JAX_PLATFORMS env var, so the
# config must be set programmatically after import.
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')

import jax

jax.config.update('jax_platforms', 'cpu')
assert jax.devices()[0].platform == 'cpu'

# Persistent compilation cache: suite wall time is dominated by repeated jit
# compiles of the recurrent/GAN nets; cache entries survive across runs.
_cache_dir = os.environ.get('JAX_COMPILATION_CACHE_DIR',
                            '/tmp/bsvd_tpu_test_jax_cache')
try:
    jax.config.update('jax_compilation_cache_dir', _cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
except Exception:
    pass

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line('markers', 'slow: long-running test')
