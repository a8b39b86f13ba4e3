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

    # ---- the WIDTH-FOLDED stems as the MIMO path actually runs them ----
    from bsvd_tpu.archs.wnet_arch import _stage_apply_folded, _fold2
    from bsvd_tpu.nn.layers import get_act
    from bsvd_tpu.ops.conv3x3 import (conv3x3_pallas, conv3x3_supported,
                                      fold_width_weights,
                                      fold_width_stride2_weights)
    print('--- folded full-res segment (as run in MIMO) ---')
    actf = get_act(cfg.act)
    t_st = timeit(lambda p, v: _stage_apply_folded(p, v, cfg, actf),
                  s0, x.reshape(1, T, H, W, 4))
    print(f'stage0 folded end-to-end       : {t_st*1e3:8.2f} ms')

    xf8 = jnp.asarray(rng.uniform(0, 1, (T, H, W // 2, 8)), dt)
    w1, b1 = fold_width_weights(s0['inc']['c1']['w'], s0['inc']['c1']['b'])

    def site_xla(v, w_, b_, a=True):
        y = jax.lax.conv_general_dilated(
            v, w_, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b_.astype(v.dtype)
        return act(y) if a else y
    t = timeit(site_xla, xf8, w1, b1)
    print(f'inc c1 folded 8->128 xla       : {t*1e3:8.2f} ms')

    xf = jnp.asarray(rng.uniform(0, 1, (T, H, W // 2, 128)), dt)
    w2, b2 = fold_width_weights(s0['inc']['c2']['w'], s0['inc']['c2']['b'])
    t_xla = timeit(site_xla, xf, w2, b2)
    gff = 2 * 9 * 128 * 128 * H * (W // 2) * T / 1e9
    msg = f'inc c2 folded 128->128 xla     : {t_xla*1e3:8.2f} ms ({gff/t_xla/1e3:5.1f} TF/s)'
    if conv3x3_supported((T, H, W // 2, 128), w2.shape, dt):
        t_pal = timeit(lambda v, a_, c_: conv3x3_pallas(v, a_, c_,
                       shift='none', act='relu6'), xf, w2, b2)
        msg += f' | pallas {t_pal*1e3:8.2f} ms ({gff/t_pal/1e3:5.1f} TF/s)'
    print(msg)

    wd, bd = fold_width_stride2_weights(s0['down0']['conv']['w'],
                                        s0['down0']['conv']['b'])

    def down_xla(v, w_, b_):
        y = jax.lax.conv_general_dilated(
            v, w_, (2, 1), ((1, 1), (1, 0)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b_.astype(v.dtype)
        return act(y)
    t = timeit(down_xla, xf, wd, bd)
    print(f'down0 s2 folded 128->128 xla   : {t*1e3:8.2f} ms')

    # down1 (natural 270p input): plain s2 vs width-folded s2
    x1n = jnp.asarray(rng.uniform(0, 1, (T, H // 2, W // 2, 128)), dt)
    t_n = timeit(lambda p, v: act(conv2d(p['down1']['conv'], v, stride=2)),
                 s0, x1n)
    wd1, bd1 = fold_width_stride2_weights(s0['down1']['conv']['w'],
                                          s0['down1']['conv']['b'])
    x1f = x1n.reshape(T, H // 2, W // 4, 256)
    t_f = timeit(down_xla, x1f, wd1, bd1)
    print(f'down1 s2 @270p: natural xla {t_n*1e3:7.2f} ms | folded xla {t_f*1e3:7.2f} ms')

    wo2, bo2 = fold_width_weights(s0['outc']['c2']['w'], s0['outc']['c2']['b'])
    t_xla = timeit(lambda v, a_, c_: site_xla(v, a_, c_, False), xf, wo2, bo2)
    msg = f'outc c2 folded 128->128 xla    : {t_xla*1e3:8.2f} ms'
    if conv3x3_supported((T, H, W // 2, 128), wo2.shape, dt):
        t_pal = timeit(lambda v, a_, c_: conv3x3_pallas(v, a_, c_,
                       shift='none', act='none'), xf, wo2, bo2)
        msg += f' | pallas {t_pal*1e3:8.2f} ms'
    print(msg)


if __name__ == '__main__':
    main()
