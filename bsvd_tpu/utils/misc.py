"""Filesystem / experiment-dir / resume helpers
(reference behaviors: BasicSR/basicsr/utils/misc.py:11-141)."""

import os
import re
import time
from os import path as osp


def get_time_str():
    return time.strftime('%Y%m%d_%H%M%S', time.localtime())


def mkdir_and_rename(path):
    """mkdir; if it exists, archive-rename the old one with a timestamp."""
    if osp.exists(path):
        new_name = path + '_archived_' + get_time_str()
        print(f'Path already exists. Rename it to {new_name}', flush=True)
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


def make_exp_dirs(opt):
    """Create the experiment directory tree for the run. Main process only
    (reference misc.py:29 ``@master_only``): the archive-rename of an
    existing experiment dir must not race across hosts."""
    from bsvd_tpu.parallel.mesh import is_main_process
    if not is_main_process():
        return
    path_opt = dict(opt['path'])
    if opt['is_train']:
        mkdir_and_rename(path_opt.pop('experiments_root'))
    else:
        mkdir_and_rename(path_opt.pop('results_root'))
    for key, p in path_opt.items():
        if ('strict_load' in key or 'pretrain_network' in key
                or 'resume' in key or 'param_key' in key):
            continue
        if isinstance(p, str):
            os.makedirs(p, exist_ok=True)


def scandir(dir_path, suffix=None, recursive=False, full_path=False):
    """Yield file paths under dir_path, optionally filtered by suffix."""
    if (suffix is not None) and not isinstance(suffix, (str, tuple)):
        raise TypeError('"suffix" must be a string or tuple of strings')
    root = dir_path

    def _scandir(dir_path, suffix, recursive):
        for entry in os.scandir(dir_path):
            if not entry.name.startswith('.') and entry.is_file():
                if full_path:
                    return_path = entry.path
                else:
                    return_path = osp.relpath(entry.path, root)
                if (suffix is None) or return_path.endswith(suffix):
                    yield return_path
            elif recursive and entry.is_dir():
                yield from _scandir(entry.path, suffix=suffix, recursive=recursive)

    return _scandir(dir_path, suffix=suffix, recursive=recursive)


def check_resume(opt, resume_iter):
    """On resume, repoint pretrain_network_* at the checkpoint matching the
    resume state unless explicitly ignored (reference misc.py:94-124)."""
    if not opt['path'].get('resume_state'):
        return
    networks = [key for key in opt.keys() if key.startswith('network_')]
    flag_pretrain = False
    for network in networks:
        if opt['path'].get(f'pretrain_{network}') is not None:
            flag_pretrain = True
    if flag_pretrain:
        print('pretrain_network path will be ignored during resuming.', flush=True)
    for network in networks:
        name = f'pretrain_{network}'
        basename = network.replace('network_', '')
        if opt['path'].get('ignore_resume_networks') is None or (
                network not in opt['path']['ignore_resume_networks']):
            opt['path'][name] = osp.join(opt['path']['models'],
                                         f'net_{basename}_{resume_iter}.npz')
            print(f"Set {name} to {opt['path'][name]}", flush=True)


def sizeof_fmt(size, suffix='B'):
    for unit in ('', 'K', 'M', 'G', 'T', 'P', 'E', 'Z'):
        if abs(size) < 1024.0:
            return f'{size:3.1f} {unit}{suffix}'
        size /= 1024.0
    return f'{size:3.1f} Y{suffix}'


def digit_sort_key(path):
    """Sort key: integer formed by all digits in the filename (reference
    get_imagenames sort, Experimental_root/data/utils_common.py:94)."""
    digits = ''.join(re.findall(r'\d+', osp.basename(path)))
    return int(digits) if digits else 0
