"""Profiling & FLOPs harness (reference: Experimental_root/scripts/profiler.py
MyTimeit time/line/torchprofile modes + MyFlops ptflops/thop modes).

TPU adaptation:
- 'time'  : best-of-N wall timing with a device-side dependency chain —
  block_until_ready is unreliable through remote-tunnel backends, so K
  chained executions + one scalar readback bound the true device time.
- 'trace' : jax.profiler trace (TensorBoard-viewable), replacing
  torch.profiler's chrome trace.
- FLOPs/memory come from the compiled executable's XLA cost analysis
  instead of ptflops/thop module hooks.
"""

import contextlib
import time

import jax
import jax.numpy as jnp


class Timeit:
    """Decorator/harness timing a jittable fn: ``Timeit('time')(fn)(args...)``.

    The wrapped callable returns (result, seconds_per_call)."""

    def __init__(self, mode='time', number=5, repeat=3, trace_dir=None):
        self.mode = mode
        self.number = number
        self.repeat = repeat
        self.trace_dir = trace_dir or '/tmp/bsvd_tpu_trace'

    def __call__(self, fn):
        if self.mode == 'time':
            def wrapped(*args, **kwargs):
                out = fn(*args, **kwargs)
                jax.block_until_ready(out)
                ssum = jax.jit(lambda y: jnp.sum(
                    jnp.asarray(jax.tree.leaves(y)[0], jnp.float32)))
                float(ssum(out))
                best = float('inf')
                for _ in range(self.repeat):
                    t0 = time.perf_counter()
                    for _ in range(self.number):
                        out = fn(*args, **kwargs)
                    float(ssum(out))
                    best = min(best, (time.perf_counter() - t0) / self.number)
                return out, best
            return wrapped
        if self.mode == 'trace':
            def wrapped(*args, **kwargs):
                out = fn(*args, **kwargs)   # warm/compile outside the trace
                jax.block_until_ready(out)
                with jax.profiler.trace(self.trace_dir):
                    t0 = time.perf_counter()
                    out = fn(*args, **kwargs)
                    jax.block_until_ready(out)
                    dt = time.perf_counter() - t0
                print(f'trace written to {self.trace_dir}')
                return out, dt
            return wrapped
        raise ValueError(f'unknown Timeit mode {self.mode!r}')


def annotate(name):
    """Named profiler region (shows up in the jax trace)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def step_annotation(step):
    with jax.profiler.StepTraceAnnotation('train', step_num=step):
        yield


def flops_and_memory(fn, *example_args):
    """Compile ``fn`` and report XLA's cost analysis.

    Returns dict with flops, bytes_accessed (when exposed by the backend),
    peak_memory estimates, and output/arg sizes.
    """
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    out = {}
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        for key in ('flops', 'bytes accessed', 'bytes accessed operand',
                    'utilization'):
            if key in ca:
                out[key.replace(' ', '_')] = ca[key]
    except Exception as e:
        out['cost_analysis_error'] = str(e)
    try:
        ma = compiled.memory_analysis()
        for key in ('temp_size_in_bytes', 'argument_size_in_bytes',
                    'output_size_in_bytes', 'generated_code_size_in_bytes'):
            if hasattr(ma, key):
                out[key] = getattr(ma, key)
    except Exception as e:
        out['memory_analysis_error'] = str(e)
    return out


def count_params(params):
    return sum(int(x.size) for x in jax.tree.leaves(params))


def device_memory_stats():
    """Live per-device memory stats when the backend exposes them."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = None
    return stats
