#!/usr/bin/env python
"""Per-site timing of the frame-by-frame streaming step (NT=1) on the real
TPU chip: XLA conv vs the row-block-pipelined Pallas NT=1 kernel at every
candidate site shape, plus the full steady-state step.

The streaming step is the north-star path (BASELINE.md >30 fps); MIMO does
~14 ms/frame, streaming ~28 — this tool shows where the per-frame time goes
and what the NT=1 kernel buys per site.
"""

import sys as _sys
import os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np


def timeit(fn, *args, k=20, reps=3):
    import jax
    import jax.numpy as jnp
    jfn = jax.jit(fn)
    ssum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    y = jfn(*args)
    float(ssum(y))
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            y = jfn(*args)
        float(ssum(y))
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from bsvd_tpu.archs.streaming import StreamDenoiser, stream_init, stream_step
    from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_init
    from bsvd_tpu.ops.conv3x3 import conv3x3_pallas, conv3x3_supported

    print('devices:', jax.devices())
    dt = jnp.bfloat16
    cfg = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                     norm='none', act='relu6', shift_mode='TSM')
    params = jax.tree.map(lambda a: a.astype(dt),
                          wnet_init(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    H, W = 540, 960

    # ---- full steady-state step ----
    sd = StreamDenoiser(params, cfg, batch=1, height=H, width=W, dtype=dt)
    frame = jnp.asarray(rng.uniform(0, 1, (1, H, W, 4)), dt)
    for _ in range(sd.latency + 3):
        sd.push(frame)
    ssum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    float(ssum(jax.tree.leaves(sd.state[0]['down0'][0])[1]))
    best = float('inf')
    for _ in range(3):
        k = 20
        t0 = time.perf_counter()
        for _ in range(k):
            out = sd.push(frame)
        float(ssum(out))
        best = min(best, (time.perf_counter() - t0) / k)
    print(f'full steady-state step        : {best*1e3:8.2f} ms/frame '
          f'({1/best:5.1f} fps)')

    # ---- per-site A/B: XLA vs Pallas NT=1, per candidate shape ----
    from jax import lax

    def xla_site(x, w, b, act='relu6'):
        y = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        y = y + b.astype(y.dtype)
        return jnp.clip(y, 0, jnp.asarray(6, y.dtype)) if act == 'relu6' else y

    sites = [
        ('inc c2 folded  540x480x128->128', (1, 540, 480, 128), 128, 'relu6'),
        ('outc c1 folded 540x480x128->128', (1, 540, 480, 128), 128, 'relu6'),
        ('cv conv @270p  270x480x128->128', (1, 270, 480, 128), 128, 'relu6'),
        ('cv conv @135p  135x240x256->256', (1, 135, 240, 256), 256, 'relu6'),
        ('up2 conv @135p 135x240x256->512', (1, 135, 240, 256), 512, 'none'),
        ('up1 conv @270p 270x480x128->256', (1, 270, 480, 128), 256, 'none'),
    ]
    for name, shp, cout, act in sites:
        _, h, w_, c = shp
        x = jnp.asarray(rng.uniform(0, 1, shp), dt)
        wgt = jnp.asarray(rng.standard_normal((3, 3, c, cout)) * 0.05, dt)
        bia = jnp.zeros((cout,), dt)
        gf = 2 * 9 * c * cout * h * w_ / 1e9
        t_x = timeit(lambda v, w2, b2, _a=act: xla_site(v, w2, b2, _a),
                     x, wgt, bia)
        line = (f'{name}: xla {t_x*1e3:7.3f} ms ({gf/t_x/1e3:5.1f} TF/s)')
        if conv3x3_supported(shp, wgt.shape, dt):
            t_p = timeit(lambda v, w2, b2: conv3x3_pallas(
                v, w2, b2, shift='none', act=act), x, wgt, bia)
            line += f' | pallas {t_p*1e3:7.3f} ms ({gf/t_p/1e3:5.1f} TF/s)'
        print(line)

    # stride-2 folded down conv sites (XLA only today)
    def xla_down(x, w, b):
        y = lax.conv_general_dilated(x, w, (2, 1), ((1, 1), (1, 0)),
                                     dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return jnp.clip(y + b.astype(y.dtype), 0, jnp.asarray(6, y.dtype))

    for name, shp, kshape in [
            ('down0 s2 folded 540x480x128->128', (1, 540, 480, 128),
             (3, 2, 128, 128)),
            ('down1 s2        270x480x128->256', (1, 270, 480, 128),
             (3, 3, 128, 256))]:
        x = jnp.asarray(rng.uniform(0, 1, shp), dt)
        wgt = jnp.asarray(rng.standard_normal(kshape) * 0.05, dt)
        bia = jnp.zeros((kshape[-1],), dt)
        if kshape[1] == 2:
            t_x = timeit(xla_down, x, wgt, bia)
        else:
            t_x = timeit(lambda v, w2, b2: jnp.clip(lax.conv_general_dilated(
                v, w2, (2, 2), [(1, 1), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b2, 0, 6),
                x, wgt, bia)
        print(f'{name}: xla {t_x*1e3:7.3f} ms')

    # inc c1 folded (8-lane input) — the C=4 entry conv
    x = jnp.asarray(rng.uniform(0, 1, (1, 540, 480, 8)), dt)
    wgt = jnp.asarray(rng.standard_normal((3, 3, 8, 128)) * 0.05, dt)
    bia = jnp.zeros((128,), dt)
    t_x = timeit(xla_site, x, wgt, bia)
    print(f'inc c1 folded  540x480x8->128  : xla {t_x*1e3:7.3f} ms')

    # outc c2 folded 128->128, no act
    x = jnp.asarray(rng.uniform(0, 1, (1, 540, 480, 128)), dt)
    wgt = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, dt)
    bia = jnp.zeros((128,), dt)
    t_x = timeit(lambda v, w2, b2: xla_site(v, w2, b2, 'none'), x, wgt, bia)
    line = f'outc c2 folded 540x480x128->128(none): xla {t_x*1e3:7.3f} ms'
    if conv3x3_supported((1, 540, 480, 128), wgt.shape, dt):
        t_p = timeit(lambda v, w2, b2: conv3x3_pallas(
            v, w2, b2, shift='none', act='none'), x, wgt, bia)
        line += f' | pallas {t_p*1e3:7.3f} ms'
    print(line)


if __name__ == '__main__':
    main()
