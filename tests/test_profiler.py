"""Smoke tests for the profiling harness (reference:
Experimental_root/scripts/profiler.py MyTimeit/MyFlops) and the profile.py
CLI protocol pieces that run on the CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from bsvd_tpu.profiler import (Timeit, count_params, device_memory_stats,
                               flops_and_memory)


def test_timeit_time_mode_returns_positive_seconds():
    f = jax.jit(lambda x: jnp.tanh(x) @ x.T)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 64)),
                    jnp.float32)
    out, secs = Timeit('time', number=2, repeat=2)(f)(x)
    assert out.shape == (64, 64)
    assert 0 < secs < 60


def test_timeit_trace_mode_writes_trace(tmp_path):
    f = jax.jit(lambda x: jnp.sin(x) * 2)
    x = jnp.ones((32, 32), jnp.float32)
    out, dt = Timeit('trace', trace_dir=str(tmp_path))(f)(x)
    assert np.allclose(np.asarray(out), np.sin(1.0) * 2)
    assert dt > 0
    # a plugins/profile/<ts>/ tree with at least one artifact
    found = list(tmp_path.rglob('*.pb')) + list(tmp_path.rglob('*.json*')) \
        + list(tmp_path.rglob('*.xplane*'))
    assert found, f'no trace artifacts under {tmp_path}'


def test_flops_and_memory_reports_matmul_flops():
    def f(a, b):
        return a @ b
    a = jnp.ones((128, 256), jnp.float32)
    b = jnp.ones((256, 64), jnp.float32)
    rep = flops_and_memory(f, a, b)
    # 2*M*N*K MACs-as-flops; XLA may fold constants so allow slack
    if 'flops' in rep:
        assert rep['flops'] >= 2 * 128 * 256 * 64 * 0.5
    assert ('output_size_in_bytes' not in rep
            or rep['output_size_in_bytes'] >= 128 * 64 * 4)
    assert 'cost_analysis_error' not in rep or 'flops' in rep


def test_count_params_and_memory_stats():
    tree = {'a': jnp.ones((3, 4)), 'b': {'c': jnp.ones((5,))}}
    assert count_params(tree) == 17
    stats = device_memory_stats()
    assert set(stats) == {str(d) for d in jax.devices()}
