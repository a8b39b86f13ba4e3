#!/usr/bin/env python
"""Benchmark: BSVD-c64 540p 10-frame denoise, the reference profile protocol
(reference: profile.py + Experimental_root/scripts/profiler.py:32-67 —
fp16 input (1, 10, 4, 540, 960), best-of-N timing loop; published baseline
0.353594 s per 10-frame loop on an RTX-3090-class GPU, README.md:99-107).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = speedup factor over the reference latency (>1 is faster).
"""

import json
import time

import numpy as np

BASELINE_S = 0.353594   # reference: 10 frames of 540x960, fp16, RTX 3090


def main():
    from bsvd_tpu.utils.platform import setup_compilation_cache
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_apply, wnet_init

    cfg = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                     norm='none', act='relu6', shift_mode='TSM')
    dtype = jnp.bfloat16
    params = jax.tree.map(lambda a: a.astype(dtype),
                          wnet_init(jax.random.PRNGKey(0), cfg))

    n, t, h, w, c = 1, 10, 540, 960, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (n, t, h, w, c)), dtype)

    # Chainable forward (output re-shaped to input) so repeated calls form a
    # device-side dependency chain: on backends where block_until_ready is
    # unreliable (remote-tunnel TPU), K chained calls + one scalar readback
    # still measure true execution time.
    def chain_fwd(p, x):
        y = wnet_apply(p, x, cfg)
        return jnp.concatenate([y, x[..., 3:]], axis=-1)

    fwd = jax.jit(chain_fwd)
    ssum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    float(ssum(fwd(params, x)))               # compile + warm + sync

    times = []
    for _ in range(4):                        # best-of-N protocol
        k = 5
        y = x
        t0 = time.perf_counter()
        for _ in range(k):
            y = fwd(params, y)
        float(ssum(y))                        # sync
        times.append((time.perf_counter() - t0) / k)
    best = min(times)

    print(json.dumps({
        'metric': 'bsvd_c64_540p_10frame_latency',
        'value': round(best, 6),
        'unit': 's',
        'vs_baseline': round(BASELINE_S / best, 3),
    }))


if __name__ == '__main__':
    main()
