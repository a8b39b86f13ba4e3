"""Honor the JAX_PLATFORMS env var even when a platform plugin (axon TPU
tunnel) programmatically overrides it — call before first device use."""

import os


def apply_platform_env():
    plat = os.environ.get('JAX_PLATFORMS', '')
    if plat and plat != 'axon':
        import jax
        try:
            jax.config.update('jax_platforms', plat)
        except Exception:
            pass
