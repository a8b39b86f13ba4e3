"""Sweep row-block heights (bh) for every Pallas conv family at the
flagship 540p shapes — the all-families companion of sweep_chain_bh.py.

Captures every conv3x3 / conv_s2 / pixel-shuffle / bibuffer Pallas call
during one flagship MIMO forward (wnet_apply) and one streaming step
(stream_step), then times each distinct call signature across valid bh
divisors on the attached device. Prints chosen-vs-best per signature so
the `_pick_bh*` VMEM estimates can be recalibrated (see conv_chain.py's
24.9 MiB ceiling, tuned by sweep_chain_bh.py the same way).
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
from bsvd_tpu.archs import streaming as sm
from bsvd_tpu.ops import bibuffer_conv as bb
from bsvd_tpu.ops import conv3x3 as c3
from bsvd_tpu.ops import conv_s2 as s2


def timeit(fn, *args, k=64, reps=3):
    """Device time per call: k queued dispatches + one scalar-readback sync
    (block_until_ready is unreliable on the remote tunnel; the fixed ~30 ms
    per-sync ramp amortizes to <2% at k=64 — PERF.md methodology)."""
    ssum = jax.jit(lambda y: sum(jnp.sum(l.astype(jnp.float32))
                                 for l in jax.tree.leaves(y)))
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


# (module, attr, bh-base: rows the grid splits — output rows for conv_s2)
TARGETS = [
    (c3, 'conv3x3_pallas', lambda sig: sig[0][0][1]),
    (c3, 'conv_ps_fold_pallas', lambda sig: sig[0][0][1]),
    (c3, 'conv_ps_natural_pallas', lambda sig: sig[0][0][1]),
    (s2, 'conv_s2_pallas', lambda sig: sig[0][0][1] // 2),
    (bb, 'bibuffer_conv_pallas', lambda sig: sig[0][0][1]),
]


def install_spies(calls):
    """Patch each target with a recording wrapper; return the originals.
    Only the OUTERMOST call per target records (conv3x3_pallas's c=64
    width-fold path recurses into itself; bh passes straight through, so
    sweeping the outer call is sweeping the inner)."""
    originals = {}
    for mod, name, _ in TARGETS:
        orig = getattr(mod, name)
        originals[name] = orig
        depth = [0]

        def spy(*args, _orig=orig, _name=name, _depth=depth, **kw):
            if _depth[0] == 0:
                sig = tuple(None if a is None else
                            (tuple(a.shape), str(a.dtype)) for a in args)
                kws = tuple(sorted((k, v) for k, v in kw.items()
                            if k not in ('bh', 'interpret')
                            and isinstance(v, (str, int, float, bool,
                                               type(None)))))
                calls.setdefault((_name, sig, kws), 0)
                calls[(_name, sig, kws)] += 1
            _depth[0] += 1
            try:
                return _orig(*args, **kw)
            finally:
                _depth[0] -= 1

        setattr(mod, name, spy)
    return originals


def main():
    T, H, W = 10, 540, 960
    cfg = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                     norm='none', act='relu6', shift_mode='TSM')
    params = wnet_init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    calls = {}
    originals = install_spies(calls)
    try:
        x = jax.random.normal(jax.random.PRNGKey(1), (1, T, H, W, 4),
                              jnp.bfloat16)
        jax.block_until_ready(wnet_apply(params, x, cfg))
        n_mimo = sum(calls.values())
        print(f'MIMO forward: {n_mimo} calls, {len(calls)} distinct')

        state = sm.stream_init(cfg, 1, H, W, jnp.bfloat16)
        frame = jax.random.normal(jax.random.PRNGKey(2), (1, H, W, 4),
                                  jnp.bfloat16)
        st, out, _ = sm.stream_step(params, state, frame, True, cfg)
        jax.block_until_ready(out)
        print(f'+ stream_step: {sum(calls.values()) - n_mimo} calls, '
              f'{len(calls)} distinct total')
    finally:
        for mod, name, _ in TARGETS:
            setattr(mod, name, originals[name])

    base_of = {name: basef for _, name, basef in TARGETS}
    key = jax.random.PRNGKey(3)
    for (name, sig, kws), cnt in sorted(calls.items(), key=repr):
        fn = originals[name]
        base = base_of[name](sig)
        args = [None if s is None else
                (jax.random.normal(key, s[0], jnp.dtype(s[1])) * 0.05
                 if 'float' in s[1] else jnp.zeros(s[0], jnp.dtype(s[1])))
                for s in sig]
        # drop trailing Nones (optional positionals)
        while args and sig[-1] is None:
            args, sig = args[:-1], sig[:-1]
        kw = dict(kws)
        print(f'\n{name} {sig} kw={kw} xN={cnt}')
        results = {}
        try:
            t = timeit(functools.partial(fn, **kw), *args)
            print(f'  default : {t*1e3:7.3f} ms  (heuristic bh)')
            results['default'] = t
        except Exception as e:
            print(f'  default-bh probe FAILED: {type(e).__name__}: '
                  f'{str(e)[:120]}')
        for bh in sorted(d for d in range(1, base + 1) if base % d == 0):
            if bh > 64:
                continue
            w_ = sig[0][0][2]
            if bh * w_ < 512:
                continue
            try:
                t = timeit(functools.partial(fn, bh=bh, **kw), *args)
                results[bh] = t
                print(f'  bh={bh:3d}: {t*1e3:7.3f} ms')
            except Exception as e:
                print(f'  bh={bh:3d}: FAIL {type(e).__name__}: '
                      f'{str(e)[:100]}')
        if results:
            best = min(results, key=results.get)
            print(f'  best bh={best} ({results[best]*1e3:.3f} ms) x{cnt}')


if __name__ == '__main__':
    main()
