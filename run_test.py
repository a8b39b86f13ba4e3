#!/usr/bin/env python
"""Evaluation entry point: ``python run_test.py -opt options/test/<cfg>.yml``
(reference CLI: run_test.py)."""

import os.path as osp

from bsvd_tpu.utils.platform import apply_platform_env

if __name__ == '__main__':
    apply_platform_env()
    from bsvd_tpu.test import test_pipeline
    root_path = osp.abspath(osp.dirname(__file__))
    test_pipeline(root_path)
