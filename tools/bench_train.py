#!/usr/bin/env python
"""Training-step throughput on the reference protocol.

Reference budget: BSVD-c64 trains at ~4 it/s effective on 2x RTX 3090
(batch 8/GPU x 2 GPUs = 16 clips of 11 frames, 96x96 crops — reference
options/train/bsvd_c64_unblind.yml:16-19,74 + README.md:80). This times the
jitted train step (forward + MSE + backward + Adam + EMA) on one chip at
that effective batch, fp32 and bf16-AMP (`train.fp16`).

Steps form a natural device-side dependency chain (each consumes the
previous params/opt_state), so K steps + one loss readback measure true
execution time even where block_until_ready is unreliable (remote tunnel,
see PERF.md "Measurement methodology").

Usage: python tools/bench_train.py [--batch 16] [--iters 10]
"""

import argparse
import sys
import time
from os.path import abspath, dirname

sys.path.insert(0, dirname(dirname(abspath(__file__))))


def bench(amp, batch, iters):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_init
    from bsvd_tpu.losses import MSELoss
    from bsvd_tpu.models.denoising_model import make_train_step

    cfg = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                     norm='none', act='relu6', shift_mode='TSM')
    params = wnet_init(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    ema = jax.tree.map(jnp.array, params)

    rng = np.random.default_rng(0)
    t, h, w = 11, 96, 96
    gt = jnp.asarray(rng.uniform(0, 1, (batch, t, h, w, 3)), jnp.float32)
    lq = jnp.concatenate(
        [gt + 0.1 * jnp.asarray(rng.normal(size=gt.shape), jnp.float32),
         jnp.full((batch, t, h, w, 1), 0.1, jnp.float32)], axis=-1)
    batch_d = {'lq': lq, 'gt': gt}

    step = jax.jit(make_train_step(cfg, tx, MSELoss(), amp=amp),
                   donate_argnums=(0, 1, 2))
    params, opt_state, ema, loss = step(params, opt_state, ema, batch_d,
                                        0, 0.999)
    float(loss['l_pix'])                      # compile + warm + sync

    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            params, opt_state, ema, loss = step(params, opt_state, ema,
                                                batch_d, i, 0.999)
        float(loss['l_pix'])                  # sync the chain
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--iters', type=int, default=10)
    args = ap.parse_args()

    from bsvd_tpu.utils.platform import setup_compilation_cache
    setup_compilation_cache()

    for amp in (False, True):
        s = bench(amp, args.batch, args.iters)
        print(f"{'bf16-AMP' if amp else 'fp32    '}: {s * 1e3:8.2f} ms/it "
              f"= {1.0 / s:5.2f} it/s  (batch {args.batch} x 11 x 96x96)")


if __name__ == '__main__':
    main()
