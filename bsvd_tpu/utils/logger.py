"""Logging: root logger, train-loop message logger with ETA, timers,
TensorBoard writer (reference behaviors: BasicSR/basicsr/utils/logger.py)."""

import datetime
import logging
import time

initialized_logger = {}


def get_root_logger(logger_name='bsvd_tpu', log_level=logging.INFO, log_file=None):
    """Root logger with console + optional file handler (created once).

    Multi-host: only the main process logs at ``log_level`` and writes the
    log file; the others are ERROR-only with no file handler (reference:
    BasicSR/basicsr/utils/logger.py:142-181 rank-0 gating)."""
    logger = logging.getLogger(logger_name)
    if logger_name in initialized_logger:
        return logger
    from bsvd_tpu.parallel.mesh import is_main_process
    main = is_main_process()
    format_str = '%(asctime)s %(levelname)s: %(message)s'
    stream_handler = logging.StreamHandler()
    stream_handler.setFormatter(logging.Formatter(format_str))
    logger.addHandler(stream_handler)
    logger.propagate = False
    logger.setLevel(log_level if main else logging.ERROR)
    if log_file is not None and main:
        file_handler = logging.FileHandler(log_file, 'w')
        file_handler.setFormatter(logging.Formatter(format_str))
        file_handler.setLevel(log_level)
        logger.addHandler(file_handler)
    initialized_logger[logger_name] = True
    return logger


class AvgTimer:
    """Running-average interval timer (iter/data timing in the train loop)."""

    def __init__(self, window=200):
        self.window = window
        self.current_time = 0
        self.total_time = 0
        self.count = 0
        self.avg_time = 0
        self.start()

    def start(self):
        self.start_time = self.tic = time.time()

    def record(self):
        self.count += 1
        self.toc = time.time()
        self.current_time = self.toc - self.tic
        self.total_time += self.current_time
        self.avg_time = self.total_time / self.count
        if self.count > self.window:
            self.count = 0
            self.total_time = 0
        self.tic = time.time()

    def get_current_time(self):
        return self.current_time

    def get_avg_time(self):
        return self.avg_time


class MessageLogger:
    """Formats periodic training log lines: epoch/iter/lr/ETA/losses,
    mirrored to TensorBoard when available."""

    def __init__(self, opt, start_iter=1, tb_logger=None):
        self.exp_name = opt['name']
        self.interval = opt['logger']['print_freq']
        self.start_iter = start_iter
        self.max_iters = int(opt['train']['total_iter'])
        self.use_tb_logger = opt['logger'].get('use_tb_logger', False)
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = get_root_logger()

    def reset_start_time(self):
        self.start_time = time.time()

    def __call__(self, log_vars):
        epoch = log_vars.pop('epoch')
        current_iter = log_vars.pop('iter')
        lrs = log_vars.pop('lrs')

        message = (f'[{self.exp_name[:31]}..][epoch:{epoch:3d}, iter:{current_iter:8,d}, lr:(')
        for v in lrs:
            message += f'{v:.3e},'
        message += ')] '

        if 'time' in log_vars.keys():
            iter_time = log_vars.pop('time')
            data_time = log_vars.pop('data_time')
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / (current_iter - self.start_iter + 1)
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(eta_sec)))
            message += f'[eta: {eta_str}, '
            message += f'time (data): {iter_time:.3f} ({data_time:.3f})] '

        for k, v in log_vars.items():
            message += f'{k}: {v:.4e} '
            if self.tb_logger is not None:
                label = f'losses/{k}' if k.startswith('l_') else k
                self.tb_logger.add_scalar(label, v, current_iter)
        self.logger.info(message)


class TBLogger:
    """Minimal TensorBoard scalar writer backed by tf.summary.

    Kept behind a lazy import so environments without tensorflow still work
    (logging silently becomes a no-op)."""

    def __init__(self, log_dir):
        self._writer = None
        try:
            import tensorflow as tf
            self._tf = tf
            self._writer = tf.summary.create_file_writer(log_dir)
        except Exception:
            self._tf = None

    def add_scalar(self, tag, value, step):
        if self._writer is None:
            return
        with self._writer.as_default():
            self._tf.summary.scalar(tag, float(value), step=int(step))

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()


def init_tb_logger(log_dir):
    """TensorBoard writer — main process only (reference logger.py:114-120
    ``@master_only``); callers treat None as 'no TB'."""
    from bsvd_tpu.parallel.mesh import is_main_process
    if not is_main_process():
        return None
    return TBLogger(log_dir)


def get_env_info():
    import jax
    import bsvd_tpu
    msg = ('\nFramework: bsvd_tpu'
           f'\n\tVersion: {bsvd_tpu.__version__}'
           f'\n\tJAX: {jax.__version__}'
           f'\n\tDevices: {[str(d) for d in jax.devices()]}')
    return msg


def init_wandb_logger(opt):
    """Sync the TB log to wandb (reference: BasicSR/basicsr/utils/logger.py
    :122-139). Main process only (reference ``@master_only``). wandb is not
    bundled in this image; the import error surfaces with a clear message
    when the config asks for it."""
    from bsvd_tpu.parallel.mesh import is_main_process
    if not is_main_process():
        return None
    try:
        import wandb
    except ImportError as e:
        raise ImportError(
            'logger.wandb is configured but the wandb package is not '
            'installed in this environment.') from e
    logger = get_root_logger()
    project = opt['logger']['wandb']['project']
    resume_id = opt['logger']['wandb'].get('resume_id')
    if resume_id:
        wandb_id, resume = resume_id, 'allow'
        logger.warning(f'Resume wandb logger with id={wandb_id}.')
    else:
        wandb_id, resume = wandb.util.generate_id(), 'never'
    wandb.init(id=wandb_id, resume=resume, name=opt['name'], config=opt,
               project=project, sync_tensorboard=True)
    logger.info(f'Use wandb logger with id={wandb_id}; project={project}.')
