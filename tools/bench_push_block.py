#!/usr/bin/env python
"""Root-cause harness for the push_block scan regression (round-4 item 7).

Times, at the flagship 540p bf16 streaming config on the real chip:
  1. per-frame push (jitted single step, donated state)   — the baseline
  2. push_block as lax.scan over F frames                 — round-3 impl
  3. push_block UNROLLED (Python loop in one jit)         — no scan carry
                                                            machinery

Hypothesis: scan double-buffers the carry (16 packed buffers + 3 skip
rings, ~hundreds of MB at 540p), paying a state copy per step that eats
the ~3.7 ms/frame dispatch saving; unrolling lets XLA update buffers in
place across steps.

Usage: python tools/bench_push_block.py [--frames 8] [--reps 5]
"""

import argparse
import sys
import time
from os.path import abspath, dirname

sys.path.insert(0, dirname(dirname(abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=8)
    ap.add_argument('--reps', type=int, default=5)
    ap.add_argument('--height', type=int, default=544)
    ap.add_argument('--width', type=int, default=960)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from bsvd_tpu.archs.streaming import stream_init, stream_step
    from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_init
    from bsvd_tpu.utils.platform import setup_compilation_cache
    setup_compilation_cache()

    cfg = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                     norm='none', act='relu6', shift_mode='TSM')
    dt = jnp.bfloat16
    params = jax.tree.map(lambda a: a.astype(dt),
                          wnet_init(jax.random.PRNGKey(0), cfg))
    n, h, w = 1, args.height, args.width
    f = args.frames
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 1, (f, n, h, w, 4)), dt)
    frame1 = frames[0]

    def step1(p, s, fr):
        s, out, _ = stream_step(p, s, fr, True, cfg, assume_filled=True)
        return s, out

    def block_scan(p, s, fr):
        def body(c, x):
            c, out, _ = stream_step(p, c, x, True, cfg, assume_filled=True)
            return c, out
        return lax.scan(body, s, fr)

    def block_unroll(p, s, fr):
        outs = []
        for i in range(f):
            s, out, _ = stream_step(p, s, fr[i], True, cfg,
                                    assume_filled=True)
            outs.append(out)
        return s, jnp.stack(outs)

    variants = {
        'push x1 (baseline)': (jax.jit(step1, donate_argnums=(1,)), frame1, 1),
        f'block scan F={f}': (jax.jit(block_scan, donate_argnums=(1,)),
                              frames, f),
        f'block unroll F={f}': (jax.jit(block_unroll, donate_argnums=(1,)),
                                frames, f),
    }

    # block_until_ready is unreliable through the remote tunnel (PERF.md
    # "Measurement methodology"): sync via a scalar readback instead — the
    # repeated calls chain through the donated state, so one readback of the
    # last output waits for the whole chain.
    ssum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    for name, (fn, inp, nf) in variants.items():
        state = stream_init(cfg, n, h, w, dt)
        # prime the pipeline so steady-state kernels engage correctly
        state, out = fn(params, state, inp)
        float(ssum(out))
        best = float('inf')
        for _ in range(args.reps):
            t0 = time.perf_counter()
            iters = max(1, 32 // nf)
            for _ in range(iters):
                state, out = fn(params, state, inp)
            float(ssum(out))
            best = min(best, (time.perf_counter() - t0) / (iters * nf))
        print(f'{name:24s}: {best * 1e3:7.2f} ms/frame')


if __name__ == '__main__':
    main()
