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
sys.path.insert(0, dirname(abspath(__file__)))      # tools/ (make_synth_dataset)


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
    # model-FLOPs estimate for MFU: 3x the forward's conv FLOPs (fwd +
    # input-grad + weight-grad convs — the standard train-step accounting),
    # from the XLA cost analysis of the jitted FORWARD alone (the train
    # step's own cost_analysis would double-count our Pallas kernels'
    # CostEstimate against XLA's recomputes).
    model_tflop = None
    try:
        from bsvd_tpu.archs.wnet_arch import wnet_apply
        fwd = jax.jit(lambda p, v: wnet_apply(p, v, cfg))
        ca = fwd.lower(params, batch_d['lq']).compile().cost_analysis()
        model_tflop = 3 * float(ca['flops']) / 1e12
    except Exception:
        pass
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
    return best, model_tflop


def _ensure_synth_data(path, clips=8, t=40, h=480, w=854, fmt='jpg'):
    """DAVIS-train-shaped by default: 480p JPEG frame folders (the
    reference's training storage, JPEGImages/480p)."""
    import os
    if not os.path.isdir(path) or not os.listdir(path):
        from make_synth_dataset import main as make_ds
        make_ds(path, num_clips=clips, t=t, h=h, w=w, seed=0, fmt=fmt)
    return path


def bench_real_data(amp, batch, iters, data_dir, num_workers=None):
    """End-to-end training throughput INCLUDING the host input pipeline:
    decode + crop + augment + noise synthesis (data/video_train_loader.py,
    the DALI replacement — reference video_dali_dataset.py:45-74) feeding
    the jitted train step. Reports loader-only rate, step-only rate, and
    the overlapped end-to-end rate with loader stall time. Auto-scales
    ``num_workers`` (doubling up to the core count) while the loader alone
    cannot sustain the device step rate."""
    import os
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bsvd_tpu.archs.wnet_arch import WNetConfig, wnet_init
    from bsvd_tpu.data import build_dataset
    from bsvd_tpu.losses import MSELoss
    from bsvd_tpu.models.denoising_model import make_train_step

    cfg = WNetConfig(chns=(64, 128, 256), mid_ch=64, interm_ch=64,
                     norm='none', act='relu6', shift_mode='TSM')
    params = wnet_init(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    ema = jax.tree.map(jnp.array, params)
    step = jax.jit(make_train_step(cfg, tx, MSELoss(), amp=amp),
                   donate_argnums=(0, 1, 2))

    # reference train protocol: 11-frame 96x96 crops, sigma ~ U[5,55]/255
    # (options/train/bsvd_c64_unblind.yml:16-19,74)
    loader_opt = {
        'name': 'bench', 'type': 'train_video_loader',
        'trainset_dir': data_dir, 'batch_size_per_gpu': batch,
        'num_devices': 1, 'temp_patch_size': 11, 'patch_size': 96,
        'max_number_patches': 2560000, 'noise_ival': [5, 55],
        'noise_shape': 'NF', 'manual_seed': 0,
    }
    if num_workers:
        loader_opt['num_workers'] = num_workers

    def host_prep(d):
        # what model.optimize_parameters does before the jitted step
        lq = np.concatenate([d['lq'], d['noise_map']], axis=2)
        return {'lq': np.transpose(lq, (0, 1, 3, 4, 2)).copy(),
                'gt': np.transpose(d['gt'], (0, 1, 3, 4, 2)).copy()}

    # device-step-only rate (warm first)
    loader = build_dataset(loader_opt)
    it0 = iter(loader)
    first = host_prep(next(it0))
    params, opt_state, ema, loss = step(params, opt_state, ema, first, 0,
                                        0.999)
    float(loss['l_pix'])

    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, ema, loss = step(params, opt_state, ema, first,
                                            i, 0.999)
    float(loss['l_pix'])
    step_s = (time.perf_counter() - t0) / iters

    results = {}
    while True:
        # loader-only sustained rate (drain whatever is prefetched first)
        for _ in range(2):
            next(it0)
        t0 = time.perf_counter()
        for _ in range(iters):
            next(it0)
        loader_s = (time.perf_counter() - t0) / iters

        # end-to-end: loader + host prep overlapped with the async step
        stall = 0.0
        t0 = time.perf_counter()
        for i in range(iters):
            s0 = time.perf_counter()
            d = next(it0)
            stall += time.perf_counter() - s0
            batch_d = host_prep(d)
            params, opt_state, ema, loss = step(params, opt_state, ema,
                                                batch_d, i, 0.999)
        float(loss['l_pix'])
        e2e_s = (time.perf_counter() - t0) / iters

        nw = loader._num_workers
        results = {'step_its': 1.0 / step_s, 'loader_its': 1.0 / loader_s,
                   'e2e_its': 1.0 / e2e_s,
                   'loader_stall_ms': stall / iters * 1e3,
                   'num_workers': nw}
        ncpu = os.cpu_count() or 1
        if loader_s > step_s * 1.05 and nw < ncpu:
            # input-bound: double the decode pool and retry
            loader.close()
            loader_opt['num_workers'] = min(nw * 2, ncpu)
            loader = build_dataset(loader_opt)
            it0 = iter(loader)
            continue
        break
    loader.close()
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--real-data', action='store_true',
                    help='bench end-to-end incl. the host input pipeline '
                         '(decode+augment+noise) on --data')
    ap.add_argument('--data', default='/tmp/bsvd_bench_trainset_480p',
                    help='dataset dir for --real-data (synthesized if absent)')
    args = ap.parse_args()

    from bsvd_tpu.utils.platform import setup_compilation_cache
    setup_compilation_cache()

    if args.real_data:
        data_dir = _ensure_synth_data(args.data)
        for amp in (False, True):
            r = bench_real_data(amp, args.batch, args.iters, data_dir)
            tag = 'bf16-AMP' if amp else 'fp32    '
            print(f"{tag} real-data: e2e {r['e2e_its']:5.2f} it/s "
                  f"(step-only {r['step_its']:5.2f}, loader-only "
                  f"{r['loader_its']:5.2f}, stall {r['loader_stall_ms']:.1f} "
                  f"ms/it, workers {r['num_workers']}) "
                  f"(batch {args.batch} x 11 x 96x96)")
        return

    # v5e peak: 197 TF/s bf16 (394 int8); fp32 runs through the same MXU
    # at bf16-input precision on this workload so use the same peak
    peak_tfs = 197.0
    for amp in (False, True):
        s, tflop = bench(amp, args.batch, args.iters)
        mfu = (f', MFU {tflop / s / peak_tfs * 100:4.1f}% '
               f'({tflop / s:5.1f} TF/s model)' if tflop else '')
        print(f"{'bf16-AMP' if amp else 'fp32    '}: {s * 1e3:8.2f} ms/it "
              f"= {1.0 / s:5.2f} it/s  (batch {args.batch} x 11 x 96x96)"
              f"{mfu}")


if __name__ == '__main__':
    main()
