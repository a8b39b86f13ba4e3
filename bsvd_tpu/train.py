"""Training pipeline: options -> dataloaders -> model -> iter loop with
periodic log/save/validation (reference: BasicSR/basicsr/train.py:91-206 +
the DALI-branch fork Experimental_root/scripts/train_pipeline.py:29-203)."""

import logging
import math
import time
from os import path as osp

from bsvd_tpu.data import build_dataloader, build_dataset
from bsvd_tpu.models import build_model, latest_resume_state
from bsvd_tpu.models.checkpoint import load_training_state
from bsvd_tpu.utils import (AvgTimer, MessageLogger, check_resume, copy_opt_file,
                            dict2str, get_env_info, get_root_logger, get_time_str,
                            init_tb_logger, make_exp_dirs)
from bsvd_tpu.utils.options import parse_options


def create_train_val_dataloader(opt, logger):
    train_loader, val_loaders, total_epochs, total_iters = None, [], 0, 0
    for phase, dataset_opt in opt['datasets'].items():
        if phase == 'train':
            dataset_opt.setdefault('manual_seed', opt.get('manual_seed', 0))
            dataset_opt.setdefault('num_devices', opt.get('num_gpu', 1))
            train_set = build_dataset(dataset_opt)
            # loader-style datasets (video pipeline) iterate themselves
            train_loader = build_dataloader(train_set, dataset_opt,
                                            num_gpu=opt['num_gpu'])
            # len(loader) counts BATCHES for both loader kinds (the video
            # loader divides max_number_patches by the global batch;
            # BatchLoader divides the sampler length) — reference
            # train_pipeline.py:49-50 computes the same quotient itself
            num_iter_per_epoch = len(train_loader)
            total_iters = int(opt['train']['total_iter'])
            total_epochs = math.ceil(total_iters / max(num_iter_per_epoch, 1))
            logger.info('Training statistics:'
                        f'\n\tNumber of train batches per epoch: {num_iter_per_epoch}'
                        f'\n\tTotal epochs: {total_epochs}; iters: {total_iters}.')
        elif phase.split('_')[0] == 'val':
            dataset_opt.setdefault('manual_seed', opt.get('manual_seed', 0))
            if opt['network_g'].get('net2d_opt', {}).get('blind', False) or \
                    opt['network_g'].get('blind', False):
                dataset_opt['blind'] = True
            val_set = build_dataset(dataset_opt)
            val_loader = build_dataloader(val_set, dataset_opt,
                                          num_gpu=opt['num_gpu'])
            logger.info(f"Number of val videos in {dataset_opt['name']}: {len(val_set)}")
            val_loaders.append(val_loader)
        else:
            raise ValueError(f'Dataset phase {phase} is not recognized.')
    return train_loader, val_loaders, total_epochs, total_iters


def load_resume_state(opt):
    resume_state_path = None
    if opt['auto_resume']:
        state_dir = osp.join('experiments', opt['name'], 'training_states')
        resume_state_path = latest_resume_state(state_dir)
        if resume_state_path:
            opt['path']['resume_state'] = resume_state_path
    elif opt['path'].get('resume_state'):
        resume_state_path = opt['path']['resume_state']

    if resume_state_path is None:
        return None
    resume_state = load_training_state(resume_state_path)
    check_resume(opt, resume_state['iter'])
    return resume_state


def train_pipeline(root_path, cmd=None, opt_path=None):
    # multi-host bring-up first (no-op single-process): after this,
    # jax.devices() is global and the models' meshes span all hosts
    from bsvd_tpu.parallel.mesh import init_distributed
    init_distributed()
    opt, args = parse_options(root_path, is_train=True, cmd=cmd, opt_path=opt_path)

    resume_state = load_resume_state(opt)
    if resume_state is None:
        make_exp_dirs(opt)
    if getattr(args, 'opt', None) and osp.isfile(args.opt):
        copy_opt_file(args.opt, opt['path']['experiments_root'])

    log_file = osp.join(opt['path']['log'],
                        f"train_{opt['name']}_{get_time_str()}.log")
    logger = get_root_logger(log_level=logging.INFO, log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))
    tb_logger = None
    # wandb first so sync_tensorboard catches the TB writer (reference
    # train.py init_tb_loggers ordering)
    if (opt['logger'].get('wandb') is not None
            and opt['logger']['wandb'].get('project') is not None):
        from bsvd_tpu.utils.logger import init_wandb_logger
        init_wandb_logger(opt)
    if opt['logger'].get('use_tb_logger'):
        tb_logger = init_tb_logger(osp.join(opt['path']['experiments_root'],
                                            'tb_logger'))

    train_loader, val_loaders, total_epochs, total_iters = (
        create_train_val_dataloader(opt, logger))

    model = build_model(opt)
    if resume_state is not None:
        model.resume_training(resume_state)
        logger.info(f"Resuming training from epoch: {resume_state['epoch']}, "
                    f"iter: {resume_state['iter']}.")
        start_epoch = resume_state['epoch']
        current_iter = resume_state['iter']
    else:
        start_epoch = 0
        current_iter = 0

    msg_logger = MessageLogger(opt, current_iter, tb_logger)
    logger.info(f'Start training from epoch: {start_epoch}, iter: {current_iter}')
    data_timer, iter_timer = AvgTimer(), AvgTimer()
    start_time = time.time()

    val_freq = (opt.get('val') or {}).get('val_freq')
    epoch = start_epoch
    stop = False
    while not stop and epoch < total_epochs + 1:
        for train_data in train_loader:
            data_timer.record()
            current_iter += 1
            if current_iter > total_iters:
                stop = True
                break
            model.feed_data(train_data)
            model.optimize_parameters(current_iter)
            iter_timer.record()
            if current_iter == 1:
                msg_logger.reset_start_time()

            if current_iter % opt['logger']['print_freq'] == 0:
                log_vars = {'epoch': epoch, 'iter': current_iter,
                            'lrs': model.get_current_learning_rate(),
                            'time': iter_timer.get_avg_time(),
                            'data_time': data_timer.get_avg_time()}
                log_vars.update(model.get_current_log())
                msg_logger(log_vars)

            if current_iter % int(opt['logger']['save_checkpoint_freq']) == 0:
                logger.info('Saving models and training states.')
                model.save(epoch, current_iter)

            if val_freq and current_iter % int(val_freq) == 0:
                for val_loader in val_loaders:
                    model.validation(val_loader, current_iter, tb_logger,
                                     opt['val'].get('save_img', False))
            data_timer.start()
            iter_timer.start()
        epoch += 1

    consumed = time.time() - start_time
    logger.info(f'End of training. Time consumed: {consumed / 3600:.2f} h')
    logger.info('Save the latest model.')
    model.save(epoch=-1, current_iter=-1)
    if val_freq:
        for val_loader in val_loaders:
            model.validation(val_loader, current_iter, tb_logger,
                             opt['val'].get('save_img', False))
    if tb_logger:
        tb_logger.close()
    return model
