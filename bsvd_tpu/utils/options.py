"""YAML experiment configuration, CLI parsing and path derivation.

Accepts the same YAML schema and CLI surface as the reference framework
(reference: BasicSR/basicsr/utils/options.py:12-198) so its experiment files
run unchanged: ``-opt``, ``--launcher``, ``--auto_resume``, ``--debug``,
``--force_yml key=value`` overrides, ``name:``-derived experiment paths,
debug-mode frequency overrides.

On TPU there is no multi-process launcher: JAX is single-controller SPMD, so
``--launcher pytorch|slurm`` maps to the same in-process device mesh
(``num_gpu`` is interpreted as the device count to use; 'auto' = all).
"""

import argparse
import os
import random
import shutil
import time
from collections import OrderedDict
from os import path as osp

import yaml


def ordered_yaml():
    """Ordered yaml loader/dumper pair (insertion-ordered dicts)."""
    try:
        from yaml import CDumper as Dumper
        from yaml import CLoader as Loader
    except ImportError:
        from yaml import Dumper, Loader

    _mapping_tag = yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG

    def dict_representer(dumper, data):
        return dumper.represent_dict(data.items())

    def dict_constructor(loader, node):
        return OrderedDict(loader.construct_pairs(node))

    Dumper.add_representer(OrderedDict, dict_representer)
    Loader.add_constructor(_mapping_tag, dict_constructor)
    return Loader, Dumper


def yaml_load(f):
    """Load yaml from a file path or string."""
    if os.path.isfile(f):
        with open(f, 'r') as fh:
            return yaml.load(fh, Loader=ordered_yaml()[0])
    return yaml.load(f, Loader=ordered_yaml()[0])


def dict2str(opt, indent_level=1):
    msg = '\n'
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += ' ' * (indent_level * 2) + k + ':['
            msg += dict2str(v, indent_level + 1)
            msg += ' ' * (indent_level * 2) + ']\n'
        else:
            msg += ' ' * (indent_level * 2) + k + ': ' + str(v) + '\n'
    return msg


def _set_by_keypath(opt, keys, value):
    node = opt
    for k in keys[:-1]:
        node = node.setdefault(k, OrderedDict())
    node[keys[-1]] = value


def apply_force_yml(opt, entries):
    """Apply ``--force_yml train:ema_decay=0.999``-style overrides."""
    if not entries:
        return
    for entry in entries:
        entry = entry.replace(' ', '')
        keys, value = entry.split('=', 1)
        value = yaml.safe_load(value)
        _set_by_keypath(opt, keys.split(':'), value)


def set_random_seed(seed):
    random.seed(seed)
    import numpy as np
    np.random.seed(seed % (2**32))


def parse_options(root_path, is_train=True, cmd=None, opt_path=None):
    """Parse CLI + YAML into the experiment options dict.

    Args:
        root_path: repo root; experiment/result dirs are derived under it.
        is_train: train vs test path layout.
        cmd: optional explicit argv list (for tests).
        opt_path: bypass CLI and load this option file directly.

    Returns:
        (opt, args)
    """
    if opt_path is not None:
        args = argparse.Namespace(opt=opt_path, launcher='none',
                                  auto_resume=False, debug=False, force_yml=None)
    else:
        parser = argparse.ArgumentParser()
        parser.add_argument('-opt', type=str, required=True,
                            help='Path to option YAML file.')
        parser.add_argument('--launcher', choices=['none', 'pytorch', 'slurm'],
                            default='none',
                            help='kept for CLI compatibility; TPU runs are '
                                 'single-controller SPMD')
        parser.add_argument('--auto_resume', action='store_true')
        parser.add_argument('--debug', action='store_true')
        parser.add_argument('--local_rank', type=int, default=0)
        parser.add_argument('--force_yml', nargs='+', default=None,
                            help='Force to update yml files. Examples: '
                                 'train:ema_decay=0.999')
        args = parser.parse_args(cmd)

    opt = yaml_load(args.opt)
    opt['dist'] = False      # single-controller: collectives live inside jit
    opt['rank'], opt['world_size'] = 0, 1

    if args.force_yml is not None:
        apply_force_yml(opt, args.force_yml)

    if args.debug and not opt['name'].startswith('debug'):
        opt['name'] = 'debug_' + opt['name']

    # device count
    num_gpu = opt.get('num_gpu', 'auto')
    if num_gpu == 'auto':
        import jax
        opt['num_gpu'] = len(jax.devices())

    # random seed
    seed = opt.get('manual_seed')
    if seed is None:
        seed = random.randint(1, 10000)
        opt['manual_seed'] = seed
    set_random_seed(seed + opt['rank'])

    opt['auto_resume'] = args.auto_resume
    opt['is_train'] = is_train

    # datasets
    for phase, dataset in (opt.get('datasets') or {}).items():
        phase_ = phase.split('_')[0]
        dataset['phase'] = phase_
        if 'scale' in opt:
            dataset['scale'] = opt['scale']
        if dataset.get('dataroot_gt') is not None:
            dataset['dataroot_gt'] = osp.expanduser(dataset['dataroot_gt'])
        if dataset.get('dataroot_lq') is not None:
            dataset['dataroot_lq'] = osp.expanduser(dataset['dataroot_lq'])

    # paths
    opt.setdefault('path', OrderedDict())
    for key, val in opt['path'].items():
        if (val is not None) and ('resume_state' in key or 'pretrain_network' in key):
            opt['path'][key] = osp.expanduser(val)

    if is_train:
        experiments_root = osp.join(root_path, 'experiments', opt['name'])
        opt['path']['experiments_root'] = experiments_root
        opt['path']['models'] = osp.join(experiments_root, 'models')
        opt['path']['training_states'] = osp.join(experiments_root, 'training_states')
        opt['path']['log'] = experiments_root
        opt['path']['visualization'] = osp.join(experiments_root, 'visualization')
        if 'debug' in opt['name']:
            for k in ('val',):
                if k in opt:
                    opt[k]['val_freq'] = 8
            opt['logger']['print_freq'] = 1
            opt['logger']['save_checkpoint_freq'] = 8
    else:
        results_root = osp.join(root_path, 'results', opt['name'])
        opt['path']['results_root'] = results_root
        opt['path']['log'] = results_root
        opt['path']['visualization'] = osp.join(results_root, 'visualization')

    return opt, args


def copy_opt_file(opt_file, experiments_root):
    """Archive the option file into the experiment dir with a launch stamp.
    Main process only (reference options.py:184 ``@master_only``)."""
    from bsvd_tpu.parallel.mesh import is_main_process
    if not is_main_process():
        return
    cmd = ' '.join(os.sys.argv)
    filename = osp.join(experiments_root, osp.basename(opt_file))
    shutil.copyfile(opt_file, filename)
    with open(filename, 'r+') as f:
        lines = f.readlines()
        lines.insert(0, f'# GENERATE TIME: {time.asctime()}\n# CMD:\n# {cmd}\n\n')
        f.seek(0)
        f.writelines(lines)
