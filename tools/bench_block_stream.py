#!/usr/bin/env python
"""Streaming-throughput A/B: per-frame scan pipeline vs block-chunked MIMO.

Times, at the flagship 540p bf16 config on the real chip:
  1. StreamDenoiser.push        — NT=1 kernels, lowest latency (count_shift)
  2. BlockStreamDenoiser psz=F  — NT=F+future chunked MIMO (weight DMA
                                  shared across the block; the reference's
                                  temp_psz protocol run incrementally)

Sync methodology (PERF.md "Measurement methodology"): block_until_ready is
unreliable through the remote tunnel; iterations chain through the client's
internal state/carries, so ONE scalar readback at the end of each timed
block syncs the whole chain. Long chains amortize the fixed ~30 ms sync.

Usage: python tools/bench_block_stream.py [--psz 8] [--future 2] [--reps 4]
"""

import argparse
import sys
import time
from os.path import abspath, dirname

sys.path.insert(0, dirname(dirname(abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--psz', type=int, default=8)
    ap.add_argument('--future', type=int, default=2)
    ap.add_argument('--reps', type=int, default=4)
    ap.add_argument('--frames-per-sync', type=int, default=64)
    ap.add_argument('--height', type=int, default=540)
    ap.add_argument('--width', type=int, default=960)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bsvd_tpu.archs.streaming import StreamDenoiser
    from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_init
    from bsvd_tpu.models.seq_inference import BlockStreamDenoiser
    from bsvd_tpu.utils.platform import setup_compilation_cache
    setup_compilation_cache()

    cfg = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                     norm='none', act='relu6', shift_mode='TSM')
    dt = jnp.bfloat16
    params = jax.tree.map(lambda a: a.astype(dt),
                          wnet_init(jax.random.PRNGKey(0), cfg))
    n, h, w = 1, args.height, args.width
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.uniform(0, 1, (n, h, w, 4)), dt)
    ssum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    k = args.frames_per_sync

    # --- per-frame scan pipeline --------------------------------------
    sd = StreamDenoiser(params, cfg, n, h, w, dtype=dt)
    for _ in range(sd.latency + 2):          # fill + reach steady state
        out = sd.push(frame)
    float(ssum(out))
    best = float('inf')
    for _ in range(args.reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = sd.push(frame)
        float(ssum(out))
        best = min(best, (time.perf_counter() - t0) / k)
    print(f'per-frame push            : {best * 1e3:7.2f} ms/frame')

    # --- block-chunked MIMO -------------------------------------------
    for psz in (args.psz, 2 * args.psz):
        bsd = BlockStreamDenoiser(params, cfg, psz=psz,
                                  future_buffer_len=args.future)
        block = [frame] * psz
        outs = bsd.push_block(list(block) + [frame] * args.future)  # warm
        float(ssum(outs[-1]))
        nblk = max(1, k // psz)
        best = float('inf')
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(nblk):
                outs = bsd.push_block(block)
            float(ssum(outs[-1]))
            best = min(best, (time.perf_counter() - t0) / (nblk * psz))
        print(f'block-chunked MIMO psz={psz:2d}: {best * 1e3:7.2f} ms/frame '
              f'(+{args.future} look-ahead latency)')


if __name__ == '__main__':
    main()
