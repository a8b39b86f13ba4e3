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

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
