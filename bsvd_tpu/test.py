"""Test pipeline: options -> val loaders -> model -> per-dataset validation
(reference: BasicSR/basicsr/test.py:11-45)."""

import logging
from os import path as osp

from bsvd_tpu.data import build_dataloader, build_dataset
from bsvd_tpu.models import build_model
from bsvd_tpu.utils import (get_env_info, get_root_logger, get_time_str,
                            make_exp_dirs, parse_options, dict2str)


def test_pipeline(root_path, cmd=None, opt_path=None):
    opt, _ = parse_options(root_path, is_train=False, cmd=cmd, opt_path=opt_path)

    make_exp_dirs(opt)
    log_file = osp.join(opt['path']['log'], f"test_{opt['name']}_{get_time_str()}.log")
    logger = get_root_logger(log_level=logging.INFO, log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))

    # propagate seed/blind to datasets for deterministic noise
    test_loaders = []
    for _, dataset_opt in sorted(opt['datasets'].items()):
        dataset_opt.setdefault('manual_seed', opt.get('manual_seed', 0))
        if opt['network_g'].get('blind', False):
            dataset_opt['blind'] = True
        test_set = build_dataset(dataset_opt)
        test_loader = build_dataloader(test_set, dataset_opt,
                                       num_gpu=opt['num_gpu'])
        logger.info(f"Number of test videos in {dataset_opt['name']}: {len(test_set)}")
        test_loaders.append(test_loader)

    model = build_model(opt)

    results = {}
    for test_loader in test_loaders:
        test_set_name = test_loader.dataset.opt['name']
        logger.info(f'Testing {test_set_name}...')
        results[test_set_name] = model.validation(
            test_loader, current_iter=opt['name'], tb_logger=None,
            save_img=opt['val'].get('save_img', False))
    return results
