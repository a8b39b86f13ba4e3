#!/usr/bin/env python
"""Per-block timing breakdown of the flagship BSVD-c64 540p MIMO forward on
the real TPU chip — identifies where the non-MXU time goes before kernel
work (reference protocol: profile.py, input (1, 10, 4, 540, 960) half).

Each block is jitted standalone on representative tensors; a chained-call
loop with one scalar readback measures device time (remote-tunnel-safe).
"""

import sys as _sys
import os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np


def timeit(fn, *args, k=8, reps=3):
    import jax
    import jax.numpy as jnp
    jfn = jax.jit(fn)
    ssum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    y = jfn(*args)
    float(ssum(y))
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        out = args[0]
        for _ in range(k):
            out = jfn(*args)
        float(ssum(out))
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_apply, wnet_init
    from bsvd_tpu.nn.layers import conv2d, pixel_shuffle
    from bsvd_tpu.ops.shift_conv import shift_conv_fused, shift_conv_reference

    print('devices:', jax.devices())
    dt = jnp.bfloat16
    cfg = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                     norm='none', act='relu6', shift_mode='TSM')
    params = jax.tree.map(lambda a: a.astype(dt),
                          wnet_init(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    T, H, W = 10, 540, 960
    x = jnp.asarray(rng.uniform(0, 1, (1, T, H, W, 4)), dt)

    full_fused = timeit(lambda p, x: wnet_apply(p, x, cfg), params, x)
    cfg_nf = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                        norm='none', act='relu6', shift_mode='TSM',
                        use_fused=False)
    full_xla = timeit(lambda p, x: wnet_apply(p, x, cfg_nf), params, x)
    print(f'full fwd fused : {full_fused*1e3:8.2f} ms')
    print(f'full fwd XLA   : {full_xla*1e3:8.2f} ms')

    s0 = params['stage0']
    act = lambda v: jnp.clip(v, 0, 6)  # noqa: E731

    # ---- stems (full res, C 4->64->64) ----
    def inc(p, x):
        h = act(conv2d(p['inc']['c1'], x))
        return act(conv2d(p['inc']['c2'], h))
    t_inc = timeit(inc, s0, x.reshape(T, H, W, 4))
    print(f'inc 4->64->64 @540p            : {t_inc*1e3:8.2f} ms')

    # ---- stride-2 down convs ----
    x0 = jnp.asarray(rng.uniform(0, 1, (T, H, W, 64)), dt)
    t_d0 = timeit(lambda p, v: act(conv2d(p['down0']['conv'], v, stride=2)),
                  s0, x0)
    print(f'down0 s2 64->128 @540p         : {t_d0*1e3:8.2f} ms')
    x1 = jnp.asarray(rng.uniform(0, 1, (T, H // 2, W // 2, 128)), dt)
    t_d1 = timeit(lambda p, v: act(conv2d(p['down1']['conv'], v, stride=2)),
                  s0, x1)
    print(f'down1 s2 128->256 @270p        : {t_d1*1e3:8.2f} ms')

    # ---- shift-conv sites: pallas vs xla, both resolutions ----
    w128 = s0['down0']['cv']['c1']['w']
    b128 = s0['down0']['cv']['c1']['b']
    t_sp = timeit(lambda v: shift_conv_fused(v, w128, b128, t_len=T),
                  x1.reshape(T, H // 2, W // 2, 128))
    t_sx = timeit(lambda v: shift_conv_reference(v, w128, b128, t_len=T),
                  x1.reshape(T, H // 2, W // 2, 128))
    gf = 2 * 9 * 128 * 128 * (H // 2) * (W // 2) * T / 1e9
    print(f'shiftconv 128 @270p pallas     : {t_sp*1e3:8.2f} ms '
          f'({gf/t_sp/1e3:6.1f} TF/s)')
    print(f'shiftconv 128 @270p xla        : {t_sx*1e3:8.2f} ms '
          f'({gf/t_sx/1e3:6.1f} TF/s)')

    x2 = jnp.asarray(rng.uniform(0, 1, (T, H // 4, W // 4, 256)), dt)
    w256 = s0['down1']['cv']['c1']['w']
    b256 = s0['down1']['cv']['c1']['b']
    t_sp2 = timeit(lambda v: shift_conv_fused(v, w256, b256, t_len=T), x2)
    t_sx2 = timeit(lambda v: shift_conv_reference(v, w256, b256, t_len=T), x2)
    gf2 = 2 * 9 * 256 * 256 * (H // 4) * (W // 4) * T / 1e9
    print(f'shiftconv 256 @135p pallas     : {t_sp2*1e3:8.2f} ms '
          f'({gf2/t_sp2/1e3:6.1f} TF/s)')
    print(f'shiftconv 256 @135p xla        : {t_sx2*1e3:8.2f} ms '
          f'({gf2/t_sx2/1e3:6.1f} TF/s)')

    # ---- up-path conv + pixel shuffle ----
    t_u2 = timeit(lambda p, v: pixel_shuffle(conv2d(p['up2']['conv'], v), 2),
                  s0, x2)
    gfu2 = 2 * 9 * 256 * 512 * (H // 4) * (W // 4) * T / 1e9
    print(f'up2 conv 256->512 + ps @135p   : {t_u2*1e3:8.2f} ms '
          f'({gfu2/t_u2/1e3:6.1f} TF/s)')
    t_u1 = timeit(lambda p, v: pixel_shuffle(conv2d(p['up1']['conv'], v), 2),
                  s0, x1)
    gfu1 = 2 * 9 * 128 * 256 * (H // 2) * (W // 2) * T / 1e9
    print(f'up1 conv 128->256 + ps @270p   : {t_u1*1e3:8.2f} ms '
          f'({gfu1/t_u1/1e3:6.1f} TF/s)')

    # ---- outc (full res) ----
    def outc(p, v, xin):
        h = act(conv2d(p['outc']['c1'], v))
        y = conv2d(p['outc']['c2'], h)
        res = xin[..., :3] - y[..., :3]
        return jnp.concatenate([res, y[..., 3:]], axis=-1)
    t_out = timeit(lambda p, v: outc(p, v, x.reshape(T, H, W, 4)), s0, x0)
    print(f'outc 64->64->3 + residual @540p: {t_out*1e3:8.2f} ms')

    per_stage = (t_inc + t_d0 + t_d1 + 2 * (t_sp + t_sp) + 2 * t_sp2 * 2
                 + t_u2 + t_u1 + t_out)
    print(f'--- sum of blocks x2 stages    : {2*per_stage*1e3:8.2f} ms '
          f'(vs full {full_fused*1e3:.2f})')


if __name__ == '__main__':
    main()
