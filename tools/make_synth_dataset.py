#!/usr/bin/env python
"""Generate a small synthetic video dataset (folders of PNG frames) for smoke
tests and benchmarks when Set8/DAVIS are not on disk.

Frames are smooth moving gradients + shapes so denoising metrics behave
sensibly (pure noise images would make PSNR meaningless).
"""

import argparse
import os

import cv2
import numpy as np


def make_clip(seed, t, h, w):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    fx, fy = rng.uniform(0.5, 2, 2)
    phase_v = rng.uniform(0, 2 * np.pi, 3)
    speed = rng.uniform(0.05, 0.2)
    cx, cy = rng.uniform(0.2, 0.8) * w, rng.uniform(0.2, 0.8) * h
    r = rng.uniform(0.1, 0.3) * min(h, w)
    frames = []
    for i in range(t):
        img = np.stack([
            0.5 + 0.4 * np.sin(2 * np.pi * (fx * xx / w + fy * yy / h) + p
                               + speed * i)
            for p in phase_v], axis=-1)
        # moving disc
        dx = cx + 2.0 * i
        mask = ((xx - dx) ** 2 + (yy - cy) ** 2) < r ** 2
        img[mask] = rng.uniform(0.1, 0.9, 3)
        frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
    return frames


def main(out_dir, num_clips=2, t=12, h=64, w=64, seed=0, fmt='png'):
    """``fmt='jpg'`` mirrors DAVIS-train's storage (JPEGImages, q~95) — the
    representative format for training-loader benchmarks; PNG mirrors
    Set8-style lossless eval data."""
    ext, args = (('jpg', [cv2.IMWRITE_JPEG_QUALITY, 95]) if fmt == 'jpg'
                 else ('png', []))
    for c in range(num_clips):
        clip_dir = os.path.join(out_dir, f'clip{c:02d}')
        os.makedirs(clip_dir, exist_ok=True)
        for i, frame in enumerate(make_clip(seed + c, t, h, w)):
            cv2.imwrite(os.path.join(clip_dir, f'{i:05d}.{ext}'),
                        cv2.cvtColor(frame, cv2.COLOR_RGB2BGR), args)
    print(f'wrote {num_clips} clips of {t}x{h}x{w} ({ext}) to {out_dir}')


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('out_dir')
    ap.add_argument('--num_clips', type=int, default=2)
    ap.add_argument('--frames', type=int, default=12)
    ap.add_argument('--height', type=int, default=64)
    ap.add_argument('--width', type=int, default=64)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--format', default='png', choices=['png', 'jpg'])
    a = ap.parse_args()
    main(a.out_dir, a.num_clips, a.frames, a.height, a.width, a.seed,
         a.format)
