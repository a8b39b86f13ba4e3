"""Sweep the chain kernel's row-block height (bh) at the flagship 540p
shapes to validate/retune `_pick_bh_chain`'s VMEM estimate.

Captures every conv_chain_pallas call shape during one flagship MIMO
forward (monkeypatch), then times each distinct shape across all valid
bh divisors on the attached device. Prints chosen-vs-best per shape.
"""

import sys as _sys
import os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_init, wnet_apply
from bsvd_tpu.ops import conv_chain as cc


def timeit(fn, *args, k=64, reps=3):
    """Device time per call: k queued dispatches + one scalar-readback sync
    (block_until_ready is unreliable on the remote tunnel; the fixed ~30 ms
    per-sync ramp amortizes to <2% at k=64 — PERF.md methodology)."""
    ssum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    out = fn(*args)
    float(ssum(out))
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        float(ssum(out))
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def main():
    T, H, W = 10, 540, 960
    cfg = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                     norm='none', act='relu6', shift_mode='TSM')
    params = wnet_init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, T, H, W, 4),
                          jnp.bfloat16)

    calls = []
    orig = cc.conv_chain_pallas

    def spy(xx, w1, b1, w2, b2, x2=None, x_res=None, **kw):
        calls.append((xx.shape, w1.shape, w2.shape, x2 is not None,
                      x_res is not None, kw.get('folded', False),
                      kw.get('act1'), kw.get('act2'), kw.get('res_ch')))
        return orig(xx, w1, b1, w2, b2, x2, x_res, **kw)

    cc.conv_chain_pallas = spy
    try:
        with jax.disable_jit(False):
            y = wnet_apply(params, x, cfg)
            jax.block_until_ready(y)
    finally:
        cc.conv_chain_pallas = orig

    distinct = {}
    for c in calls:
        distinct[c] = distinct.get(c, 0) + 1
    print(f'{len(calls)} chain calls, {len(distinct)} distinct')

    for (xshape, w1s, w2s, has_x2, has_res, folded, act1, act2,
         res_ch), cnt in distinct.items():
        nt, h, w_, c = xshape
        c1, cout = w1s[-1], w2s[-1]
        chosen = cc._pick_bh_chain(h, w_, c, c1, cout, 2,
                                   2 if has_x2 else 1, has_res, folded)
        key = jax.random.PRNGKey(2)
        xx = jax.random.normal(key, xshape, jnp.bfloat16)
        w1 = jax.random.normal(key, w1s, jnp.bfloat16) * 0.05
        b1 = jnp.zeros((c1,), jnp.bfloat16)
        w2 = jax.random.normal(key, w2s, jnp.bfloat16) * 0.05
        b2 = jnp.zeros((cout,), jnp.bfloat16)
        x2 = xx if has_x2 else None
        xr = (jax.random.normal(key, (nt, h, w_, cout), jnp.bfloat16)
              if has_res else None)
        print(f'\nshape={xshape} w1={w1s} w2={w2s} x2={has_x2} '
              f'res={has_res} folded={folded} xN={cnt}  chosen bh={chosen}')
        results = {}
        for bh in sorted(d for d in range(1, h + 1) if h % d == 0):
            if bh * w_ < 512 or bh > 10:
                continue
            try:
                fn = functools.partial(orig, act1=act1 or 'relu6',
                                       act2=act2 or 'none', res_ch=res_ch,
                                       bh=bh, folded=folded)
                t = timeit(fn, xx, w1, b1, w2, b2, x2, xr)
                results[bh] = t
                mark = ' <== chosen' if bh == chosen else ''
                print(f'  bh={bh:3d}: {t*1e3:7.3f} ms{mark}')
            except Exception as e:
                print(f'  bh={bh:3d}: FAIL {type(e).__name__}: '
                      f'{str(e)[:120]}')
        if results:
            best = min(results, key=results.get)
            loss = (results.get(chosen, float("inf")) - results[best])
            print(f'  best bh={best} ({results[best]*1e3:.3f} ms); '
                  f'chosen loses {loss*1e3:.3f} ms/call x{cnt}')


if __name__ == '__main__':
    main()
