#!/usr/bin/env python
"""Training entry point: ``python run.py -opt options/train/<cfg>.yml``
(reference CLI: run.py)."""

import os.path as osp

from bsvd_tpu.utils.platform import apply_platform_env

if __name__ == '__main__':
    apply_platform_env()
    from bsvd_tpu.train import train_pipeline
    root_path = osp.abspath(osp.dirname(__file__))
    train_pipeline(root_path)
