"""BaseModel: the train/eval engine contract + checkpointing
(reference contract: BasicSR/basicsr/models/base_model.py:13-48
feed_data / optimize_parameters / test / validation / save / resume_training;
ckpt semantics :170-328).

JAX adaptation: there is no module/device wrapping (base_model.py:62-76) —
parameters live in pytrees, device placement and parallelism happen inside
the jitted step via shardings (see bsvd_tpu/parallel/mesh.py).
"""

import os
from collections import OrderedDict
from copy import deepcopy
from os import path as osp

import jax
import jax.numpy as jnp

from bsvd_tpu.models.checkpoint import (load_npz_params, load_training_state,
                                        save_npz_params, save_training_state)
from bsvd_tpu.utils import get_root_logger


class BaseModel:

    def __init__(self, opt):
        self.opt = opt
        self.is_train = opt['is_train']
        self.schedulers = []
        self.optimizers = []
        self.log_dict = OrderedDict()

    # ---- contract -------------------------------------------------------
    def feed_data(self, data):
        raise NotImplementedError

    def optimize_parameters(self, current_iter):
        raise NotImplementedError

    def test(self):
        raise NotImplementedError

    def save(self, epoch, current_iter):
        raise NotImplementedError

    def validation(self, dataloader, current_iter, tb_logger, save_img=False):
        raise NotImplementedError

    def get_current_log(self):
        return self.log_dict

    # ---- lr -------------------------------------------------------------
    def update_learning_rate(self, current_iter, warmup_iter=-1):
        """No-op by design: the lr schedule is a pure function of the step
        inside the jitted update (bsvd_tpu/models/lr_scheduler.py)."""

    def get_current_learning_rate(self):
        sched = getattr(self, 'lr_schedule', None)
        it = getattr(self, 'current_iter', 0)
        if sched is None:
            return [0.0]
        return [float(sched(it))]

    # ---- ema ------------------------------------------------------------
    @staticmethod
    def ema_update(ema_params, params, decay):
        return jax.tree.map(
            lambda e, p: e * decay + p.astype(e.dtype) * (1 - decay),
            ema_params, params)

    # ---- checkpoint io --------------------------------------------------
    def save_network(self, param_trees, net_label, current_iter,
                     param_key='params'):
        """Save one or more param trees into models/net_<label>_<iter>.npz.

        Rank-gated: only the main process writes (reference
        base_model.py:170 ``@master_only``) — in a multi-host cluster all
        processes hold identical replicated params and would race on the
        same path.

        Args:
            param_trees: tree or list of trees.
            param_key: str or list matching param_trees.
        """
        from bsvd_tpu.parallel.mesh import is_main_process
        if not is_main_process():
            return None
        if current_iter == -1:
            current_iter = 'latest'
        save_filename = f'net_{net_label}_{current_iter}.npz'
        save_path = osp.join(self.opt['path']['models'], save_filename)

        trees = param_trees if isinstance(param_trees, (list, tuple)) else [param_trees]
        keys = param_key if isinstance(param_key, (list, tuple)) else [param_key]
        assert len(trees) == len(keys)
        save_npz_params(save_path, dict(zip(keys, trees)))

        if self.opt['path'].get('save_torch_compat', False):
            self._save_torch_compat(save_path, dict(zip(keys, trees)))
        return save_path

    def _save_torch_compat(self, npz_path, tree_dict):
        """Additionally emit a reference-loadable .pth (TSN key layout)."""
        try:
            import torch
            from bsvd_tpu.convert.torch_ckpt import params_to_tsn_state_dict
            cfg = self.net.cfg
            out = {}
            for key, tree in tree_dict.items():
                host = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), tree)
                sd = params_to_tsn_state_dict(
                    jax.tree.map(lambda a: __import__('numpy').asarray(a), host), cfg)
                out[key] = {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
            torch.save(out, npz_path.replace('.npz', '.pth'))
        except Exception as e:  # torch interop is best-effort
            get_root_logger().warning(f'torch-compat save failed: {e}')

    def load_network(self, cfg, load_path, strict=True, param_key='params',
                     dtype=None):
        """Load params from .npz (native) or .pth (reference TSN layout)."""
        logger = get_root_logger()
        logger.info(f'Loading model from {load_path} (key {param_key}).')
        from bsvd_tpu.convert.torch_ckpt import load_params
        try:
            return load_params(load_path, cfg, param_key=param_key, dtype=dtype)
        except KeyError:
            if strict:
                raise
            logger.warning(f'param key {param_key!r} missing; trying bare tree')
            return load_params(load_path, cfg, param_key=None, dtype=dtype)

    # ---- training state -------------------------------------------------
    def save_training_state(self, epoch, current_iter, opt_state=None,
                            extra=None):
        """training_states/<iter>.state: epoch, iter, optimizer state
        (reference base_model.py:280-313). Rank-gated like save_network
        (reference base_model.py:280 ``@master_only``)."""
        from bsvd_tpu.parallel.mesh import is_main_process
        if current_iter == -1 or not is_main_process():
            return
        state = {'epoch': epoch, 'iter': current_iter,
                 'opt_state': opt_state, 'extra': extra or {}}
        save_filename = f'{current_iter}.state'
        save_path = osp.join(self.opt['path']['training_states'], save_filename)
        save_training_state(save_path, state)
        return save_path

    @staticmethod
    def restore_opt_state(template, saved):
        """Rebuild an optax state from its saved (host-array) leaves, cast
        to the live state's dtypes."""
        ref = jax.tree.leaves(template)
        flat = jax.tree.leaves(saved)
        assert len(ref) == len(flat), 'optimizer state mismatch'
        return jax.tree.unflatten(
            jax.tree.structure(template),
            [jnp.asarray(v, r.dtype) for v, r in zip(flat, ref)])

    def resume_training(self, resume_state):
        """Restore the optimizer state saved by save_training_state. LR
        schedules here are pure functions of the iter counter, so there is
        no scheduler state to restore (reference base_model.py:315-328
        restores both; the BSVD override deliberately skips schedulers,
        denoising_model.py:384-397). Models with extra optimizers
        (e.g. SRGAN's D) extend this via _training_state_extra/overrides."""
        opt_state = resume_state.get('opt_state')
        if opt_state is not None:
            self.opt_state = self.restore_opt_state(self.opt_state, opt_state)

    def _training_state_extra(self):
        """Extra entries for save_training_state (e.g. a D optimizer);
        subclasses with more training state than one optimizer override."""
        return None

    # ---- loss reduction -------------------------------------------------
    def reduce_loss_dict(self, loss_dict):
        """Host-side conversion; cross-device reduction already happened
        inside the jitted step (psum via sharding — no NCCL analogue
        needed, cf. reference base_model.py:330-355)."""
        return OrderedDict((k, float(v)) for k, v in loss_dict.items())

    def print_network(self, net):
        logger = get_root_logger()
        cfg = getattr(net, 'cfg', None)
        params = getattr(net, 'params', None)
        n = sum(x.size for x in jax.tree.leaves(params)) if params else 0
        logger.info(f'Network: {net.__class__.__name__}, with {n:,d} parameters.')
        if cfg is not None:
            logger.info(str(cfg))


def build_model(opt):
    """Instantiate a registered model from the experiment options
    (reference: BasicSR/basicsr/models/__init__.py:19-30)."""
    from bsvd_tpu.utils.registry import MODEL_REGISTRY
    import bsvd_tpu.models  # noqa: F401  (ensure registry populated)
    model = MODEL_REGISTRY.get(opt['model_type'])(deepcopy(opt))
    get_root_logger().info(f'Model [{model.__class__.__name__}] is created.')
    return model


def latest_resume_state(state_dir):
    """Auto-resume: pick the max-iter .state file (reference
    train_pipeline.py:72-92)."""
    if not osp.isdir(state_dir):
        return None
    states = [f for f in os.listdir(state_dir) if f.endswith('.state')]
    if not states:
        return None
    iters = sorted(float(s.split('.state')[0]) for s in states)
    return osp.join(state_dir, f'{int(iters[-1])}.state')
