#!/usr/bin/env python
"""Benchmark: BSVD-c64 540p denoise on the reference profile protocol
(reference: profile.py + Experimental_root/scripts/profiler.py:32-67 —
fp16 input (1, 10, 4, 540, 960), best-of-N timing loop; published baseline
0.353594 s per 10-frame loop on an RTX-3090-class GPU, README.md:99-107).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", "extra"}.
The primary metric is the 10-frame MIMO latency; "extra" carries the
north-star streaming steady-state ms/frame (+fps) and the causal
(unidirectional, 0-frame-lookahead) streaming variant.
vs_baseline = speedup factor over the reference latency (>1 is faster).
"""

import json
import time

import numpy as np

BASELINE_S = 0.353594   # reference: 10 frames of 540x960, fp16, RTX 3090


def _bench_mimo(jax, jnp, params, cfg, wnet_apply):
    n, t, h, w, c = 1, 10, 540, 960, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (n, t, h, w, c)), jnp.bfloat16)

    # Chainable forward (output re-shaped to input) so repeated calls form a
    # device-side dependency chain: on backends where block_until_ready is
    # unreliable (remote-tunnel TPU), K chained calls + one scalar readback
    # still measure true execution time. The readback costs a FIXED ~30 ms
    # tunnel round trip + dispatch-pipeline refill per timed block
    # (measured: stream k=5 17.5 -> k=64 11.0 ms/frame on identical device
    # work), so K must be large enough to amortize it below the noise —
    # K=16 here bounds the inflation at ~2% (PERF.md "Measurement
    # methodology").
    def chain_fwd(p, x):
        y = wnet_apply(p, x, cfg)
        return jnp.concatenate([y, x[..., 3:]], axis=-1)

    fwd = jax.jit(chain_fwd)
    ssum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    # compiler-reported peak HBM (live d.memory_stats() is None through the
    # remote tunnel): temps + args + output of the compiled MIMO program —
    # the memory axis the reference publishes (profile.py:48-49, 2.26 GB)
    peak_hbm_gb = None
    try:
        ma = fwd.lower(params, x).compile().memory_analysis()
        peak_hbm_gb = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                       + ma.output_size_in_bytes) / 2**30
    except Exception:
        pass
    float(ssum(fwd(params, x)))               # compile + warm + sync

    times = []
    for _ in range(3):                        # best-of-N protocol
        k = 16
        y = x
        t0 = time.perf_counter()
        for _ in range(k):
            y = fwd(params, y)
        float(ssum(y))                        # sync
        times.append((time.perf_counter() - t0) / k)
    return min(times), peak_hbm_gb


def _bench_streaming(jax, jnp, params, cfg):
    """Steady-state per-frame latency of the frame-by-frame streaming client
    (the north-star metric: BASELINE.md '>30 fps/chip streaming')."""
    from bsvd_tpu.archs.streaming import StreamDenoiser
    h, w = 540, 960
    sd = StreamDenoiser(params, cfg, batch=1, height=h, width=w,
                        dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    frame = jnp.asarray(rng.uniform(0, 1, (1, h, w, cfg.effective_in_ch)),
                        jnp.bfloat16)
    ssum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))

    # fill the pipeline + absorb lazy program upload, then sync
    out = None
    for _ in range(sd.latency + 4):
        o = sd.push(frame)
        out = o if o is not None else out
    float(ssum(out))

    best = float('inf')
    for _ in range(3):
        k = 64       # amortize the fixed ~30 ms per-sync tunnel ramp
        t0 = time.perf_counter()
        for _ in range(k):
            out = sd.push(frame)
        float(ssum(out))                      # sync the dependency chain
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def main():
    from bsvd_tpu.utils.platform import setup_compilation_cache
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_init

    from bsvd_tpu.archs.wnet_arch import wnet_apply

    def make_params(cfg):
        return jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                            wnet_init(jax.random.PRNGKey(0), cfg))

    cfg = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                     norm='none', act='relu6', shift_mode='TSM')
    params = make_params(cfg)

    mimo_s, peak_hbm_gb = _bench_mimo(jax, jnp, params, cfg, wnet_apply)
    stream_s = _bench_streaming(jax, jnp, params, cfg)

    cfg_causal = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                            norm='none', act='relu6',
                            shift_mode='TSM_toFutureOnly')
    causal_s = _bench_streaming(jax, jnp, make_params(cfg_causal), cfg_causal)

    print(json.dumps({
        'metric': 'bsvd_c64_540p_10frame_latency',
        'value': round(mimo_s, 6),
        'unit': 's',
        'vs_baseline': round(BASELINE_S / mimo_s, 3),
        'extra': {
            'streaming_ms_per_frame': round(stream_s * 1e3, 3),
            'streaming_fps': round(1.0 / stream_s, 2),
            'causal_streaming_ms_per_frame': round(causal_s * 1e3, 3),
            'causal_streaming_fps': round(1.0 / causal_s, 2),
            'mimo_ms_per_frame': round(mimo_s * 1e2, 3),
            'baseline_ms_per_frame': round(BASELINE_S * 1e2, 3),
            'peak_hbm_gb': (round(peak_hbm_gb, 3)
                            if peak_hbm_gb is not None else None),
        },
    }))


if __name__ == '__main__':
    main()
