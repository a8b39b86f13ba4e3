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
    setup_compilation_cache()


def setup_compilation_cache(path=None):
    """Enable the persistent XLA compilation cache (compiles through the
    remote TPU tunnel take minutes; the cache makes reruns instant)."""
    import jax
    path = path or os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                  os.path.expanduser('~/.jax_cache'))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
