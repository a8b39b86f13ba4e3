#!/usr/bin/env python
"""Benchmark/profiling CLI reproducing the reference protocol
(reference: profile.py — build the test-config net, half precision, time a
(1, 10, 4, 540, 960) forward best-of-N, report latency + params + FLOPs +
device memory).

Usage:
    python profile.py [-opt options/test/bsvd_c64.yml] [--height 540]
                      [--width 960] [--frames 10] [--trace]
"""

import argparse
import os.path as osp

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('-opt', default='options/test/bsvd_c64.yml')
    ap.add_argument('--height', type=int, default=540)
    ap.add_argument('--width', type=int, default=960)
    ap.add_argument('--frames', type=int, default=10)
    ap.add_argument('--trace', action='store_true',
                    help='also write a jax profiler trace')
    ap.add_argument('--no-fused', action='store_true',
                    help='disable the Pallas fused shift-conv kernel')
    args = ap.parse_args()

    from bsvd_tpu.utils.platform import apply_platform_env
    apply_platform_env()

    import jax
    import jax.numpy as jnp
    import dataclasses
    from bsvd_tpu.archs import build_network
    from bsvd_tpu.profiler import Timeit, count_params, device_memory_stats, flops_and_memory
    from bsvd_tpu.utils.options import yaml_load
    from bsvd_tpu.archs.wnet_arch import wnet_apply

    opt = yaml_load(args.opt)
    net_opt = dict(opt['network_g'])
    ckpt = net_opt.get('pretrain_ckpt')
    if ckpt and not osp.isfile(ckpt):
        net_opt['pretrain_ckpt'] = None
    net_opt['param_dtype'] = jnp.bfloat16         # reference: net_g.half()
    net = build_network(net_opt)
    cfg = net.cfg
    if args.no_fused:
        cfg = dataclasses.replace(cfg, use_fused=False)

    n, t, h, w = 1, args.frames, args.height, args.width
    cin = cfg.effective_in_ch
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (n, t, h, w, cin)),
                    jnp.bfloat16)

    def chain_fwd(params, x):
        y = wnet_apply(params, x, cfg)
        pad = x[..., y.shape[-1]:]
        return jnp.concatenate([y, pad], axis=-1) if pad.shape[-1] else y

    fwd = jax.jit(chain_fwd)
    timed = Timeit('time', number=5, repeat=3)(lambda: fwd(net.params, x))
    _, sec = timed()
    print(f'input shape: {(n, t, cin, h, w)} (reference layout NFCHW)')
    print(f'time per {t}-frame forward: {sec:.6f} s '
          f'({t / sec:.1f} frames/s, {sec / t * 1e3:.2f} ms/frame)')

    print(f'params: {count_params(net.params):,d}')
    fm = flops_and_memory(lambda p, x: wnet_apply(p, x, cfg), net.params, x)
    for k, v in fm.items():
        if isinstance(v, float) and v > 1e9:
            print(f'{k}: {v:.3e}')
        else:
            print(f'{k}: {v}')
    mem = device_memory_stats()
    for d, s in mem.items():
        if s and 'peak_bytes_in_use' in s:
            print(f'{d} peak memory: {s["peak_bytes_in_use"] / 2**30:.2f} GB')

    if args.trace:
        _, dt = Timeit('trace')(lambda: fwd(net.params, x))()
        print(f'traced forward: {dt:.4f} s')


if __name__ == '__main__':
    main()
