#!/usr/bin/env python
"""Throughput A/B for the round-5 F-frame streaming block step.

Times, at the flagship 540p bf16 config on the real chip:
  1. StreamDenoiser.push            — per-frame NT=1 kernels (baseline)
  2. StreamDenoiser.push_block(F)   — stream_step_block: every temporal conv
                                      ONE weight-shared F-frame kernel
                                      (ops/bibuffer_conv.bibuffer_multi),
                                      stems/ups at NT=F

Sync methodology per PERF.md: iterations chain through the client's donated
state, ONE scalar readback per timed run amortized over many frames.

Usage: python tools/bench_stream_block_step.py [--blocks 4 8 16] [--reps 3]
"""

import argparse
import sys
import time
from os.path import abspath, dirname

sys.path.insert(0, dirname(dirname(abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--blocks', type=int, nargs='+', default=[4, 8, 16])
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--frames-per-sync', type=int, default=64)
    ap.add_argument('--height', type=int, default=540)
    ap.add_argument('--width', type=int, default=960)
    ap.add_argument('--causal', action='store_true')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bsvd_tpu.archs.streaming import StreamDenoiser
    from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_init
    from bsvd_tpu.utils.platform import setup_compilation_cache
    setup_compilation_cache()

    mode = 'TSM_toFutureOnly' if args.causal else 'TSM'
    cfg = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                     norm='none', act='relu6', shift_mode=mode)
    dt = jnp.bfloat16
    params = jax.tree.map(lambda a: a.astype(dt),
                          wnet_init(jax.random.PRNGKey(0), cfg))
    n, h, w = 1, args.height, args.width
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.uniform(0, 1, (n, h, w, 4)), dt)
    ssum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))

    def time_mode(label, push_fn, frames_per_call):
        sd = StreamDenoiser(params, cfg, batch=n, height=h, width=w, dtype=dt)
        out = None
        for _ in range(sd.latency + 2 * frames_per_call):
            o = push_fn(sd)
            out = o if o is not None else out
        float(ssum(out))
        best = float('inf')
        k = max(1, args.frames_per_sync // frames_per_call)
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(k):
                out = push_fn(sd)
            float(ssum(out))
            dt_s = (time.perf_counter() - t0) / (k * frames_per_call)
            best = min(best, dt_s)
        print(f'{label:24s} {best * 1e3:7.3f} ms/frame '
              f'({1.0 / best:6.1f} fps)')
        return best

    time_mode('push (per-frame)', lambda sd: sd.push(frame), 1)
    for f in args.blocks:
        blk = jnp.broadcast_to(frame[None], (f,) + frame.shape)

        def push_blk(sd, blk=blk):
            outs = [o for o in sd.push_block(blk) if o is not None]
            return outs[-1] if outs else None

        time_mode(f'push_block(F={f})', push_blk, f)


if __name__ == '__main__':
    main()
