#!/usr/bin/env python
"""Full-scale eval burn-in: the reference's de-facto integration test
(`run_test.py -opt bsvd_c64.yml`, reference README.md:65-71) executed at the
TRUE protocol size on the real chip — all 10 val blocks (Set8 x 5 sigmas +
DAVIS x 5 sigmas), 85-frame clips, whole-clip bf16 inference, per-scene
per-frame CSVs and visualization PNGs — using synthetic folders shaped like
Set8 (960x540) / DAVIS-480p (854x480), since the real datasets and the real
`bsvd-64.pth` are not available in this environment (no egress).

PSNR against a random-init net is meaningless; what this exercises (and
times) is the full eval harness at production scale: data feed, padding to
patch_mod, the fused whole-clip forward, metric accumulation, CSV/image
writeback, and peak HBM.

Usage: python tools/run_eval_burnin.py [--root /tmp/bsvd_burnin]
       [--set8-clips 8] [--davis-clips 8] [--frames 85] [--save-img]
"""

import argparse
import json
import os
import sys
import time
from os.path import abspath, dirname

sys.path.insert(0, dirname(dirname(abspath(__file__))))
sys.path.insert(0, dirname(abspath(__file__)))

YML_TMPL = """\
name: bsvd_c64_burnin
model_type: DenoisingModel
num_gpu: auto
manual_seed: 10

datasets:
{datasets}

network_g:
  type: BSVD
  chns: [64, 128, 256]
  mid_ch: 64
  shift_input: False
  norm: 'none'
  interm_ch: 64
  act: 'relu6'
  pretrain_ckpt: ~

path:
  pretrain_network_g: ~
  strict_load_g: true
  resume_state: ~

val:
  val_freq: !!float 1e0
  save_img: {save_img}
  temp_psz: -1
  future_buffer_len: 0
  patch_mod: 64
  fp16: True

  metrics:
    psnr:
      type: calculate_psnr
      crop_border: 2
      test_y_channel: false
    psnr_float:
      type: calculate_psnr_float
      crop_border: 2
      test_y_channel: false
    ssim:
      type: calculate_ssim
      crop_border: 2
      test_y_channel: false

logger:
  print_freq: 100
  save_checkpoint_freq: !!float 5e3
  use_tb_logger: false
  wandb:
    project: ~
    resume_id: ~
"""

BLOCK = """\
  val_{key}:
    name: {name}
    type: ValFolderDataset
    valsetdir: {dir}
    num_validation_frames: {frames}
    valnoisestd: {sigma}
"""


def ensure_data(root, set8_clips, davis_clips, frames):
    from make_synth_dataset import main as make_ds
    specs = [('Set8', set8_clips, 540, 960), ('DAVIS', davis_clips, 480, 854)]
    for name, clips, h, w in specs:
        d = os.path.join(root, name)
        probe = os.path.join(d, 'clip00', f'{frames - 1:05d}.png')
        if not os.path.exists(probe):
            t0 = time.time()
            make_ds(d, num_clips=clips, t=frames, h=h, w=w, seed=hash(name) % 1000)
            print(f'[burnin] synthesized {name}: {clips} clips x {frames} '
                  f'frames @ {w}x{h} in {time.time() - t0:.0f}s', flush=True)
    return [os.path.join(root, n) for n, *_ in specs]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', default='/tmp/bsvd_burnin')
    ap.add_argument('--set8-clips', type=int, default=8)
    ap.add_argument('--davis-clips', type=int, default=8)
    ap.add_argument('--frames', type=int, default=85)
    ap.add_argument('--save-img', action='store_true')
    ap.add_argument('--only', choices=['set8', 'davis'],
                    help='run a single dataset family (re-validation runs)')
    args = ap.parse_args()

    from bsvd_tpu.utils.platform import setup_compilation_cache
    setup_compilation_cache()

    set8, davis = ensure_data(args.root, args.set8_clips, args.davis_clips,
                              args.frames)
    blocks = []
    for sigma in (10, 20, 30, 40, 50):
        if args.only != 'davis':
            blocks.append(BLOCK.format(key=f's{sigma}', name=f'Set8_{sigma}',
                                       dir=set8, frames=args.frames,
                                       sigma=sigma))
        if args.only != 'set8':
            blocks.append(BLOCK.format(key=f'd{sigma}', name=f'davis_{sigma}',
                                       dir=davis, frames=args.frames,
                                       sigma=sigma))
    yml = YML_TMPL.format(datasets=''.join(blocks),
                          save_img=str(bool(args.save_img)).lower())
    opt_path = os.path.join(args.root, 'bsvd_c64_burnin.yml')
    os.makedirs(args.root, exist_ok=True)
    with open(opt_path, 'w') as f:
        f.write(yml)

    from bsvd_tpu.test import test_pipeline
    t0 = time.time()
    results = test_pipeline('/root/repo', opt_path=opt_path)
    wall = time.time() - t0

    frames_total = args.frames * (
        (args.set8_clips * 5 if args.only != 'davis' else 0)
        + (args.davis_clips * 5 if args.only != 'set8' else 0))
    summary = {
        'wall_s': round(wall, 1),
        'blocks': len(results),
        'frames_total': frames_total,
        'ms_per_frame_e2e': round(wall / frames_total * 1e3, 2),
        'results': {k: {m: round(float(x), 3) for m, x in v.items()}
                    for k, v in results.items()},
    }
    try:
        import jax
        stats = jax.devices()[0].memory_stats()
        if stats and stats.get('peak_bytes_in_use'):
            summary['peak_hbm_gb'] = round(
                stats['peak_bytes_in_use'] / 2**30, 3)
    except Exception:
        pass
    print('[burnin] ' + json.dumps(summary))


if __name__ == '__main__':
    main()
